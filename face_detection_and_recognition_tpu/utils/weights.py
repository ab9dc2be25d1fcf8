"""Weight conversion: every reference weight format -> flax NHWC params.

The reference distributes weights as torch ``.pth`` state dicts (blazeface,
yolov5-face, mobile_facenet), caffemodels, frozen TF graphs and OpenVINO IR.
This module maps ALL of them into our flax trees so users of the reference
models can carry their weights over; the torch converters double as test
oracles proving our NHWC re-architectures are numerically identical to the
reference graphs. Binary formats are parsed vendor-free by
``utils/model_formats.py``.

Real-weight entry path per registry entry:

  registry entry        reference weight file                importer here
  --------------------  -----------------------------------  -----------------------
  yolov5* (9 archs)     yolov5*-face .pt state dict          convert_yolov5_face
  blazeface-front/back  blazeface{back}.pth                  convert_blazeface
  mobile_facenet        mobile_facenet .pth                  convert_mobile_facenet
  ssd-resnet10          res10_300x300 .caffemodel            caffe_layers_to_arrays
                        (opencv2_dnn/model.py:21)              + structural_import
  age/gender heads      age_net/gender_net .caffemodel       convert_caffenet_head
                        (opencv2_dnn/model.py:49-83)
  mtcnn                 tf_mtcnn_fast/mtcnn.pb               convert_mtcnn_graphdef
                        (mtcnn/model.py:57-101)
  ssd-mobilenetv2/      OpenVINO IR xml+bin                  read_openvino_ir
  ssd-squeezenet/reid   (openvino/model.py:8-54)               + structural_import

Conventions:
  torch conv weight [out, in/groups, kh, kw]  -> flax kernel [kh, kw, in/g, out]
  caffe/OpenVINO conv  [out, in, kh, kw]      -> same transpose (OIHW)
  TF conv kernel [kh, kw, in, out]            -> used as-is (HWIO == flax)
  torch/caffe linear weight [out, in]         -> flax kernel [in, out]
  BN {gamma,beta,running_mean,running_var}    ->
      params {scale, bias} + batch_stats {mean, var}
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def t2f_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def t2f_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (1, 0)))


def _np(t) -> np.ndarray:
    """torch tensor -> numpy without importing torch at module scope."""
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def conv_entry(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": t2f_conv(_np(sd[f"{prefix}.weight"]))}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def bn_entries(sd: Mapping, prefix: str):
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_blazeface(sd: Mapping, back_model: bool = False) -> Dict:
    """Map the reference BlazeFace state dict (blazeface.py:115-190) onto
    our ``BlazeFaceNet`` tree. Returns {"params": ...} (no BN in this net)."""
    params: Dict = {}

    def blaze_block(torch_prefix: str) -> Dict:
        return {
            "Conv_0": conv_entry(sd, f"{torch_prefix}.convs.0"),
            "Conv_1": conv_entry(sd, f"{torch_prefix}.convs.1"),
        }

    if back_model:
        params["conv0"] = conv_entry(sd, "backbone.0")
        for i in range(31):
            params[f"BlazeBlock_{i}"] = blaze_block(f"backbone.{i + 2}")
        params["FinalBlazeBlock_0"] = blaze_block("final")
    else:
        params["conv0"] = conv_entry(sd, "backbone1.0")
        for i in range(11):
            params[f"BlazeBlock_{i}"] = blaze_block(f"backbone1.{i + 2}")
        for i in range(5):
            params[f"BlazeBlock_{11 + i}"] = blaze_block(f"backbone2.{i}")
    for head in ("classifier_8", "classifier_16", "regressor_8", "regressor_16"):
        params[head] = conv_entry(sd, head)
    return {"params": params}


def convert_yolov5_face(sd: Mapping, arch: str, nc: int = 1) -> Dict:
    """Map a reference yolov5-face torch state dict (yaml-built ``Model``,
    ``pytorch/models/yolo.py:260-327``) onto our ``YoloV5FaceNet`` tree.

    Torch layers are ``model.{i}`` in graph order; our builder names them
    ``layer{i}`` (``layer{i}_{r}`` for repeated ShuffleV2Blocks) with
    deterministic ConvBN_k/Bottleneck_k child order, so the mapping is
    purely structural.
    """
    from ..models.yolov5_face import ARCHS

    spec = ARCHS[arch]
    gd = spec["gd"]
    params: Dict = {}
    stats: Dict = {}

    def depth(n):
        return max(round(n * gd), 1) if n > 1 else n

    def convbn(conv_p: str, bn_p: str):
        p, s = bn_entries(sd, bn_p)
        return (
            {"Conv_0": conv_entry(sd, conv_p, bias=False), "BatchNorm_0": p},
            {"BatchNorm_0": s},
        )

    def conv_module(tp: str):  # yolov5 Conv: .conv + .bn
        return convbn(f"{tp}.conv", f"{tp}.bn")

    def put(name: str, pair):
        params[name], stats[name] = pair

    def c3(tp: str, n_rep: int):
        p: Dict = {}
        s: Dict = {}
        p["ConvBN_0"], s["ConvBN_0"] = conv_module(f"{tp}.cv1")
        for j in range(n_rep):
            bp: Dict = {}
            bs: Dict = {}
            bp["ConvBN_0"], bs["ConvBN_0"] = conv_module(f"{tp}.m.{j}.cv1")
            bp["ConvBN_1"], bs["ConvBN_1"] = conv_module(f"{tp}.m.{j}.cv2")
            p[f"Bottleneck_{j}"], s[f"Bottleneck_{j}"] = bp, bs
        p["ConvBN_1"], s["ConvBN_1"] = conv_module(f"{tp}.cv2")
        p["ConvBN_2"], s["ConvBN_2"] = conv_module(f"{tp}.cv3")
        return p, s

    def stem(tp: str):
        p: Dict = {}
        s: Dict = {}
        for k, sub in enumerate(("stem_1", "stem_2a", "stem_2b", "stem_3")):
            p[f"ConvBN_{k}"], s[f"ConvBN_{k}"] = conv_module(f"{tp}.{sub}")
        return p, s

    def spp(tp: str):
        p: Dict = {}
        s: Dict = {}
        p["ConvBN_0"], s["ConvBN_0"] = conv_module(f"{tp}.cv1")
        p["ConvBN_1"], s["ConvBN_1"] = conv_module(f"{tp}.cv2")
        return p, s

    def shuffle(tp: str, stride: int):
        pairs = ([("branch1.0", "branch1.1"), ("branch1.2", "branch1.3")]
                 if stride > 1 else [])
        pairs += [("branch2.0", "branch2.1"), ("branch2.3", "branch2.4"),
                  ("branch2.5", "branch2.6")]
        p: Dict = {}
        s: Dict = {}
        for k, (cp, bp) in enumerate(pairs):
            p[f"ConvBN_{k}"], s[f"ConvBN_{k}"] = convbn(f"{tp}.{cp}",
                                                        f"{tp}.{bp}")
        return p, s

    for i, (frm, n, mod, args) in enumerate(spec["graph"]):
        t = f"model.{i}"
        if mod == "Conv":
            put(f"layer{i}", conv_module(t))
        elif mod == "C3":
            put(f"layer{i}", c3(t, depth(n)))
        elif mod == "SPP":
            put(f"layer{i}", spp(t))
        elif mod == "StemBlock":
            put(f"layer{i}", stem(t))
        elif mod == "ShuffleV2Block":
            reps = depth(n)
            for r in range(reps):
                tp = t if reps == 1 else f"{t}.{r}"
                put(f"layer{i}_{r}", shuffle(tp, args[1]))
        elif mod == "Detect":
            for li in range(len(frm)):
                params[f"detect_m{li}"] = conv_entry(sd, f"{t}.m.{li}")
    return {"params": params, "batch_stats": stats}


def convert_mobile_facenet(sd: Mapping) -> Dict:
    """Map the reference MobileFaceNet state dict
    (mobile_facenet.py:104-154) onto our ``MobileFaceNet`` tree."""

    def conv_block(tp: str):
        p, s = bn_entries(sd, f"{tp}.bn")
        return (
            {
                "Conv_0": conv_entry(sd, f"{tp}.conv", bias=False),
                "BatchNorm_0": p,
                "PReLU_0": {"alpha": _np(sd[f"{tp}.prelu.weight"])},
            },
            {"BatchNorm_0": s},
        )

    def linear_block(tp: str):
        p, s = bn_entries(sd, f"{tp}.bn")
        return (
            {"Conv_0": conv_entry(sd, f"{tp}.conv", bias=False), "BatchNorm_0": p},
            {"BatchNorm_0": s},
        )

    def depthwise(tp: str):
        c0p, c0s = conv_block(f"{tp}.conv")
        c1p, c1s = conv_block(f"{tp}.conv_dw")
        c2p, c2s = linear_block(f"{tp}.project")
        return (
            {"MFConvBlock_0": c0p, "MFConvBlock_1": c1p, "MFLinearBlock_0": c2p},
            {"MFConvBlock_0": c0s, "MFConvBlock_1": c1s, "MFLinearBlock_0": c2s},
        )

    params: Dict = {}
    stats: Dict = {}

    def put(name, pair):
        params[name], stats[name] = pair

    put("conv1", conv_block("conv1"))
    put("conv2_dw", conv_block("conv2_dw"))
    put("conv_23", depthwise("conv_23"))
    for blk, nb in (("conv_3", 4), ("conv_4", 6), ("conv_5", 2)):
        bp: Dict = {}
        bs: Dict = {}
        for i in range(nb):
            bp[f"MFDepthWise_{i}"], bs[f"MFDepthWise_{i}"] = depthwise(
                f"{blk}.model.{i}"
            )
        params[blk], stats[blk] = bp, bs
    put("conv_34", depthwise("conv_34"))
    put("conv_45", depthwise("conv_45"))
    put("conv_6_sep", conv_block("conv_6_sep"))
    put("conv_6_dw", linear_block("conv_6_dw"))
    params["linear"] = {"kernel": t2f_linear(_np(sd["linear.weight"]))}
    bn1p = {"scale": _np(sd["bn.weight"]), "bias": _np(sd["bn.bias"])}
    bn1s = {"mean": _np(sd["bn.running_mean"]), "var": _np(sd["bn.running_var"])}
    params["bn"], stats["bn"] = bn1p, bn1s
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# caffemodel importers (vendor-free; parsing in utils/model_formats.py)
# ---------------------------------------------------------------------------


def c2f_conv(w: np.ndarray) -> np.ndarray:
    """caffe/OpenVINO OIHW conv kernel -> flax HWIO (same axes as torch)."""
    return t2f_conv(w)


def convert_caffenet_head(layers, num_classes: int = None) -> Dict:
    """Map an age_net/gender_net .caffemodel (Levi-Hassner CaffeNet,
    ``modules/opencv2_dnn/model.py:49-83``) onto our ``CaffeNetHead`` tree.

    ``layers`` is the output of ``model_formats.read_caffemodel``. The three
    Convolution layers map to Conv_0..2; the three InnerProduct layers to
    Dense_0..2. fc6 consumes the flattened conv3 feature map, which caffe
    flattens channel-major (C, H, W) while our NHWC module flattens
    (H, W, C) — its weight matrix is permuted accordingly.
    """
    convs = [l for l in layers if l.type == "Convolution" and l.blobs]
    fcs = [l for l in layers if l.type == "InnerProduct" and l.blobs]
    if len(convs) != 3 or len(fcs) != 3:
        raise ValueError(
            "expected a 3-conv + 3-fc CaffeNet, got "
            f"{len(convs)} Convolution / {len(fcs)} InnerProduct layers"
        )
    params: Dict = {}
    for i, l in enumerate(convs):
        params[f"Conv_{i}"] = {"kernel": c2f_conv(l.blobs[0]),
                               "bias": np.asarray(l.blobs[1])}

    # fc6: [out, C*H*W] in caffe (C,H,W) order -> (H,W,C) order -> [in, out]
    w6 = np.asarray(fcs[0].blobs[0])
    c3_out = convs[2].blobs[0].shape[0]          # conv3 output channels (384)
    hw = w6.shape[-1] // c3_out
    side = int(round(hw ** 0.5))
    if side * side * c3_out != w6.shape[-1]:
        raise ValueError(
            f"fc6 input {w6.shape[-1]} is not C*H*W with C={c3_out} square"
        )
    w6 = (w6.reshape(-1, c3_out, side, side)
          .transpose(0, 2, 3, 1)
          .reshape(w6.shape[0], -1))
    params["Dense_0"] = {"kernel": t2f_linear(w6),
                         "bias": np.asarray(fcs[0].blobs[1])}
    for i, l in enumerate(fcs[1:], start=1):
        params[f"Dense_{i}"] = {"kernel": t2f_linear(np.asarray(l.blobs[0])),
                                "bias": np.asarray(l.blobs[1])}
    out_classes = params["Dense_2"]["bias"].shape[0]
    if num_classes is not None and out_classes != num_classes:
        raise ValueError(
            f"caffemodel has {out_classes} output classes, expected {num_classes}"
        )
    return {"params": params}


def caffe_layers_to_arrays(layers) -> list:
    """Flatten caffemodel layers into the ordered array stream
    ``structural_import`` consumes: Convolution -> kernel (HWIO), bias;
    InnerProduct -> kernel [in,out], bias; BatchNorm(+Scale) -> gamma, beta,
    mean, var (caffe stores mean/var scaled by blob[2]'s scale factor)."""
    arrays = []
    i = 0
    while i < len(layers):
        l = layers[i]
        if l.type == "Convolution" and l.blobs:
            arrays.append(c2f_conv(l.blobs[0]))
            if len(l.blobs) > 1:
                arrays.append(np.asarray(l.blobs[1]))
        elif l.type == "InnerProduct" and l.blobs:
            arrays.append(t2f_linear(np.asarray(l.blobs[0])))
            if len(l.blobs) > 1:
                arrays.append(np.asarray(l.blobs[1]))
        elif l.type == "BatchNorm" and l.blobs:
            sf = float(l.blobs[2].reshape(-1)[0]) if len(l.blobs) > 2 else 1.0
            sf = 1.0 / sf if sf != 0 else 0.0
            mean = np.asarray(l.blobs[0]) * sf
            var = np.asarray(l.blobs[1]) * sf
            gamma = np.ones_like(mean)
            beta = np.zeros_like(mean)
            if i + 1 < len(layers) and layers[i + 1].type == "Scale" \
                    and layers[i + 1].blobs:
                gamma = np.asarray(layers[i + 1].blobs[0])
                if len(layers[i + 1].blobs) > 1:
                    beta = np.asarray(layers[i + 1].blobs[1])
                i += 1
            arrays += [gamma, beta, mean, var]
        i += 1
    return arrays


# ---------------------------------------------------------------------------
# generic structural import (ordered arrays -> existing flax variables tree)
# ---------------------------------------------------------------------------


_LEAF_ORDER = {"kernel": 0, "scale": 1, "bias": 2, "alpha": 3}


def _natural_key(name: str):
    """Sort flax auto-numbered siblings numerically: Conv_2 before Conv_10
    (plain string sort interleaves them at >=10 children, silently pouring
    weights into the wrong layers when consecutive shapes coincide)."""
    import re

    return tuple(int(p) if p.isdigit() else p
                 for p in re.split(r"(\d+)", name))


def _walk_slots(params: Mapping, stats: Mapping, path=()):
    """Yield (path, leaf_name, expected_shape, is_batch_stat) in canonical
    execution order. flax sorts param dicts alphabetically, so the walk
    re-orders them the way a serialized conv net streams its weights:
    within a module, Conv_* children precede BatchNorm_* children (a ConvBN
    consumes caffe Convolution -> BatchNorm -> Scale in sequence); leaves
    come kernel, scale, bias, alpha; after a BatchNorm module's params the
    matching batch_stats {mean, var} are emitted."""
    leaves = [(k, v) for k, v in params.items() if not isinstance(v, Mapping)]
    subs = [(k, v) for k, v in params.items() if isinstance(v, Mapping)]
    for key, val in sorted(leaves, key=lambda kv: (_LEAF_ORDER.get(kv[0], 9),
                                                   _natural_key(kv[0]))):
        yield (path, key, tuple(np.shape(val)), False)
    for key, val in sorted(subs, key=lambda kv: (
            0 if kv[0].startswith("Conv") else 1, _natural_key(kv[0]))):
        sub_stats = stats.get(key, {}) if isinstance(stats, Mapping) else {}
        yield from _walk_slots(val, sub_stats, path + (key,))
        if key.startswith("BatchNorm") and sub_stats:
            for leaf in ("mean", "var"):
                if leaf in sub_stats:
                    yield (path + (key,), leaf,
                           tuple(np.shape(sub_stats[leaf])), True)


def execution_module_order(net, variables: Mapping, example_shape) -> list:
    """Record the net's leaf-module CALL order (the order a serialized
    weight file streams its layers) by intercepting module methods under an
    abstract jax.eval_shape trace — no compute, no compile. flax's param
    dicts and capture_intermediates are both alphabetically sorted, so this
    interceptor is the only faithful source of execution order."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    records = []

    def interceptor(next_fn, args, kwargs, context):
        try:
            records.append(tuple(context.module.path))
        except Exception:
            pass
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        jax.eval_shape(
            lambda v: net.apply(v, jnp.zeros(example_shape, jnp.float32)),
            variables,
        )
    seen: list = []
    for path in records:
        if path and path not in seen:
            seen.append(path)
    return seen


_LEAF_PRI = {"kernel": 0, "scale": 1, "bias": 2, "alpha": 3,
             "mean": 4, "var": 5}


def ordered_slots(variables: Mapping, module_order=None) -> list:
    """The exact slot sequence structural_import consumes: canonical walk
    order, re-sorted to true execution order when ``module_order`` (from
    execution_module_order) is given."""
    params = variables.get("params", variables)
    stats = variables.get("batch_stats", {})
    slots = list(_walk_slots(params, stats))
    if module_order is None:
        return slots
    pos = {p: i for i, p in enumerate(module_order)}
    missing = len(module_order)
    return sorted(slots, key=lambda s: (pos.get(s[0], missing),
                                        _LEAF_PRI.get(s[1], 9)))


def structural_import(arrays, variables: Mapping, strict: bool = True,
                      module_order=None) -> Dict:
    """Pour an ordered array stream into an existing flax variables tree.

    This is the shape-checked path for weight files whose graphs match one of
    our architectures structurally (SSD caffemodels via
    ``caffe_layers_to_arrays``, OpenVINO IR consts). Pass ``module_order``
    (from ``execution_module_order``) so slots fill in the net's true
    execution order — the order real files stream their layers; without it
    the canonical walk order is used (alphabetical siblings, correct only
    for strictly sequential module trees). Every shape mismatch names the
    offending path. Returns a new {"params": ..., "batch_stats": ...} tree.
    """
    from .frozen import thaw

    # thaw: deep-copies the dict STRUCTURE (leaves are replaced wholesale
    # below, never mutated, so sharing them with the template is safe) and
    # accepts the engine's read-only FrozenVars views as templates
    variables = thaw(variables)
    params = {k: v for k, v in variables.get("params", variables).items()}
    stats = dict(variables.get("batch_stats", {}))
    out = {"params": params, "batch_stats": stats} if stats else {"params": params}
    slots = ordered_slots({"params": params, "batch_stats": stats},
                          module_order)
    if strict and len(arrays) != len(slots):
        raise ValueError(
            f"weight stream has {len(arrays)} arrays but the model has "
            f"{len(slots)} leaves"
        )
    for (path, leaf, shape, is_stat), arr in zip(slots, arrays):
        arr = np.asarray(arr, np.float32)
        if tuple(arr.shape) != shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path + (leaf,))}: "
                f"file {tuple(arr.shape)} vs model {shape}"
            )
        node = stats if is_stat else params
        for k in path:
            node = node[k]
        node[leaf] = arr
    return out


# ---------------------------------------------------------------------------
# frozen-graph MTCNN importer
# ---------------------------------------------------------------------------

_MTCNN_STAGES = ("pnet", "rnet", "onet")


def convert_mtcnn_graphdef(consts, variables: Mapping) -> Dict:
    """Map a frozen MTCNN GraphDef's Const tensors (blaueck/tf-mtcnn
    ``weights/tf_mtcnn_fast/mtcnn.pb``, loaded by the reference at
    ``modules/mtcnn/model.py:57-101``) onto our cascade's variables
    (``MTCNN.variables()`` -> {"pnet": ..., "rnet": ..., "onet": ...}).

    Consts are grouped per stage by name substring and matched against our
    P/R/O-Net slots by NAME KIND first (kernel/weight vs bias vs
    prelu/alpha substrings), graph order + shape as tie-break — TF kernels
    are HWIO like flax, so no transposes. Name-kind matching makes the pour
    robust to graphs whose const serialization order differs from execution
    order (same-shape 1-D bias/alpha pairs would otherwise silently swap);
    unnamed or uninformative consts still fall back to in-order shape
    matching.
    """
    by_stage = {s: [] for s in _MTCNN_STAGES}
    for c in consts:
        low = c.name.lower()
        for s in _MTCNN_STAGES:
            if s in low:
                by_stage[s].append(c)
                break

    def name_kind(name: str):
        low = name.lower()
        base = low.rsplit("/", 1)[-1].split(":")[0]
        if "alpha" in low or "prelu" in low:
            return "alpha"
        if "bias" in base or base in ("b", "beta"):
            return "bias"
        if "weight" in base or "kernel" in base or base == "w":
            return "kernel"
        return None

    from .frozen import thaw

    out: Dict = {}
    for stage in _MTCNN_STAGES:
        tree = variables[stage]
        # thaw: deep mutable copy of the structure (accepts the engine's
        # FrozenVars views; leaves are replaced below, never mutated)
        params = thaw(tree["params"])
        pool = list(by_stage[stage])
        if not pool:
            raise ValueError(f"no consts matching stage '{stage}' in graph")
        kinds = [name_kind(c.name) for c in pool]
        used = [False] * len(pool)
        for path, leaf, shape, _ in _walk_slots(params, {}):
            want = leaf if leaf in ("kernel", "bias", "alpha") else None
            hit = None
            if want is not None:  # pass 1: matching name kind + shape
                for j, c in enumerate(pool):
                    if (not used[j] and kinds[j] == want
                            and tuple(c.value.shape) == shape):
                        hit = j
                        break
            if hit is None:  # pass 2: kind-agnostic (unnamed consts only)
                for j, c in enumerate(pool):
                    if (not used[j] and kinds[j] is None
                            and tuple(c.value.shape) == shape):
                        hit = j
                        break
            if hit is None:  # pass 3: any shape match (legacy behavior)
                for j, c in enumerate(pool):
                    if not used[j] and tuple(c.value.shape) == shape:
                        hit = j
                        break
            if hit is None:
                raise ValueError(
                    f"{stage}: no const of shape {shape} left for "
                    f"{'/'.join(path + (leaf,))}"
                )
            used[hit] = True
            node = params
            for k in path:
                node = node[k]
            node[leaf] = np.asarray(pool[hit].value, np.float32)
        out[stage] = {"params": params}
    return out


# ---------------------------------------------------------------------------
# keras FaceNet importer (SavedModel TensorBundle / HDF5)
# ---------------------------------------------------------------------------

# keras attribute -> stream priority matching _LEAF_PRI's per-module order
# (kernel, scale/gamma, bias/beta, mean, var)
_KERAS_ATTR_PRI = {"kernel": 0, "depthwise_kernel": 0, "gamma": 1,
                   "beta": 2, "bias": 2, "moving_mean": 3,
                   "moving_variance": 4}


def keras_bundle_stream(named) -> list:
    """Order (name, array) pairs from a TF2 SavedModel variables bundle
    into the model's layer stream.

    TF2 object-graph checkpoint keys look like
    ``layer_with_weights-12/kernel/.ATTRIBUTES/VARIABLE_VALUE``: layers are
    numbered in build order, attributes sorted alphabetically (which puts
    conv ``bias`` before ``kernel``) — regroup by layer index and emit
    kernel/gamma/beta/mean/var order. Optimizer slots and the step counter
    are dropped."""
    import re

    groups: dict = {}
    for name, arr in named:
        if "/.OPTIMIZER_SLOT" in name or ".ATTRIBUTES/VARIABLE_VALUE" not in name:
            continue
        m = re.search(r"layer_with_weights-(\d+)/([a-z_]+)/", name)
        if not m:
            continue
        idx, attr = int(m.group(1)), m.group(2)
        if attr not in _KERAS_ATTR_PRI:
            continue
        groups.setdefault(idx, []).append((_KERAS_ATTR_PRI[attr], attr, arr))
    out = []
    for idx in sorted(groups):
        for _, _, arr in sorted(groups[idx], key=lambda t: t[0]):
            out.append(arr)
    return out


def read_keras_h5_stream(path: str) -> list:
    """Weight arrays from a keras ``.h5`` file in the model's own layer
    order (``model_weights`` attrs ``layer_names`` / ``weight_names`` —
    keras stores [kernel, bias] / [gamma, beta, moving_mean,
    moving_variance], already the structural stream order)."""
    import h5py

    out = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        layer_names = [n.decode() if isinstance(n, bytes) else n
                       for n in g.attrs.get("layer_names", [])]
        if not layer_names:
            layer_names = list(g.keys())
        for lname in layer_names:
            lg = g[lname]
            wnames = [n.decode() if isinstance(n, bytes) else n
                      for n in lg.attrs.get("weight_names", [])]
            for wn in wnames:
                out.append(np.asarray(lg[wn]))
    return out


def convert_facenet_keras(stream, net, variables: Mapping) -> Dict:
    """Pour a keras FaceNet weight stream (from ``read_keras_h5_stream`` or
    ``keras_bundle_stream``) into our InceptionResNetV1 tree
    (``models/facenet.py``) — keras and flax are both HWIO, so this is a
    pure shape-checked structural pour in execution order. Matches the
    reference's ``tf.keras.models.load_model``
    (``similar_face_filtering/filter_faces_using_reference.py:131``)."""
    order = execution_module_order(net, variables, (1, 160, 160, 3))
    return structural_import(list(stream), variables, module_order=order)


# ---------------------------------------------------------------------------
# TF-GraphDef flavor of the OpenCV face SSD
# ---------------------------------------------------------------------------


def dequantize_graphdef_consts(consts) -> list:
    """Collapse TF ``quantize_weights``-transform triplets back to f32.

    The reference's second OpenCV artifact, ``opencv_face_detector_uint8.pb``
    (``modules/opencv2_dnn/model.py:30-32``), stores each weight tensor as
    three Consts the way TF's graph-transform tool emits them:
    ``<stem>_quantized_const`` (uint8), ``<stem>_quantized_min`` and
    ``<stem>_quantized_max`` (f32 scalars). Dequantization is MIN_COMBINED:
    ``w = min + q * (max - min) / 255`` — cross-validated against
    ``tf.quantization.dequantize`` in tests/test_model_formats.py. Plain
    f32 Consts pass through; the min/max scalars are consumed."""
    from .model_formats import GraphConst

    by_name = {c.name: c for c in consts}
    out = []
    for c in consts:
        if c.name.endswith("_quantized_min") or c.name.endswith(
                "_quantized_max"):
            continue
        if c.name.endswith("_quantized_const"):
            stem = c.name[: -len("_quantized_const")]
            mn = by_name.get(stem + "_quantized_min")
            mx = by_name.get(stem + "_quantized_max")
            if mn is None or mx is None:
                raise ValueError(
                    f"{c.name}: missing _quantized_min/_quantized_max "
                    "siblings")
            lo = float(np.asarray(mn.value).reshape(-1)[0])
            hi = float(np.asarray(mx.value).reshape(-1)[0])
            deq = lo + c.value.astype(np.float32) * ((hi - lo) / 255.0)
            out.append(GraphConst(name=stem, value=deq))
        else:
            out.append(c)
    return out


def _gd_name_kind(cname: str):
    base = cname.lower().rsplit("/", 1)[-1].split(":")[0]
    if "gamma" in base or base in ("scale", "mul", "w"):
        return "gamma"
    if "beta" in base or "offset" in base:
        return "beta"
    if "mean" in base:
        return "mean"
    if "var" in base:
        return "var"
    if "bias" in base or base in ("b",):
        return "bias"
    if "weight" in base or "kernel" in base or "conv" in base:
        return "kernel"
    return None


def convert_res10_graphdef(consts, net) -> Dict:
    """Pour a TF-GraphDef face-SSD's consts into the res10 deploy graph
    (``models/res10.py`` — the same net OpenCV builds for BOTH its
    ``.caffemodel`` and ``.pb`` artifacts, README FPS rows 18 vs 19).

    The artifact class (``opencv_face_detector_uint8.pb``) is a
    transform-optimized inference graph: weights quantized to uint8
    triplets (dequantized first, :func:`dequantize_graphdef_consts`) and
    batch norms FOLDED. So: CONV kernels/biases come from the file —
    name-prefix match first (``<layer>/...`` or ``<layer>_...``), graph
    order + shape as fallback; BatchNorm slots default to the identity
    statistics (mean 0, var 1, sf 1 — also this repo's frozen-BN training
    convention, train/caffe_golden.py) and Scale slots to the identity
    affine, unless the graph carries layer-prefixed consts for them
    (matched by name kind: gamma/beta/mean/var). TF kernels are HWIO;
    caffe blobs are OIHW — a 4-D const is transposed (3,2,0,1) when that
    (and not its raw shape) matches the slot. Raises with a per-layer
    diagnostic table when conv slots cannot fill."""
    consts = dequantize_graphdef_consts(consts)
    used = [False] * len(consts)
    bn_layers = {s.name for s in net.steps if s.op == "batchnorm"}
    scale_layers = {s.name for s in net.steps if s.op == "scale"}

    def owner_prefix(cname: str, layer: str) -> bool:
        return (cname == layer or cname.startswith(layer + "/")
                or cname.startswith(layer + "_"))

    def fit(value: np.ndarray, slot: np.ndarray):
        """f32 view of ``value`` reshaped/transposed to the slot's layout,
        or None."""
        v = np.asarray(value, np.float32)
        want = tuple(slot.shape)
        if v.ndim == 4:
            hwio = np.transpose(v, (3, 2, 0, 1))
            if tuple(hwio.shape) == want:
                return hwio
        if tuple(v.shape) == want:
            return v
        if v.size == slot.size and v.ndim <= 1:
            return v.reshape(want)
        return None

    def take_prefixed(layer: str, slot, want_kind=None):
        for j, c in enumerate(consts):
            if used[j] or not owner_prefix(c.name, layer):
                continue
            if want_kind is not None and _gd_name_kind(c.name) != want_kind:
                continue
            f = fit(c.value, slot)
            if f is not None:
                used[j] = True
                return f
        return None

    out: Dict = {}
    problems = []
    for layer, ours in net.weights.items():
        if layer in bn_layers:
            # blobs [mean, var, scale_factor]: identity statistics unless
            # the graph carries layer-prefixed mean/var consts (the
            # scale_factor has no TF counterpart — always 1)
            blobs = []
            for slot, kind, ident in zip(ours, ("mean", "var", None),
                                         (np.zeros, np.ones, np.ones)):
                v = take_prefixed(layer, slot, kind) if kind else None
                blobs.append(v if v is not None
                             else ident(np.shape(slot), np.float32))
            out[layer] = blobs
            continue
        if layer in scale_layers:
            # blobs [gamma(, beta)]: identity affine unless present
            blobs = []
            for slot, kind, ident in zip(ours, ("gamma", "beta"),
                                         (np.ones, np.zeros)):
                v = take_prefixed(layer, slot, kind)
                blobs.append(v if v is not None
                             else ident(np.shape(slot), np.float32))
            out[layer] = blobs
            continue
        poured = []
        for si, slot in enumerate(ours):
            want = "kernel" if np.ndim(slot) == 4 else "bias"
            f = take_prefixed(layer, slot, want)
            if f is None:
                f = take_prefixed(layer, slot)     # prefixed, any kind
            if f is None:                           # graph order + shape
                for j, c in enumerate(consts):
                    if used[j]:
                        continue
                    g = fit(c.value, slot)
                    if g is not None:
                        used[j] = True
                        f = g
                        break
            if f is None:
                problems.append(
                    f"  {layer}: no const left for slot {tuple(slot.shape)}")
                break
            poured.append(f)
        else:
            out[layer] = poured
    if problems:
        raise ValueError("GraphDef pour failed:\n" + "\n".join(problems))
    return out
