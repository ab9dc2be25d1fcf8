"""Weight conversion: torch checkpoints -> flax NHWC params.

The reference distributes weights as torch ``.pth`` state dicts (blazeface,
yolov5-face, mobile_facenet), caffemodels, TF graphs and OpenVINO IR. This
module maps the torch family into our flax trees so users of the reference
models can carry their weights over; it is also the test oracle that proves
our NHWC re-architectures are numerically identical to the reference graphs.

Conventions:
  torch conv weight [out, in/groups, kh, kw]  -> flax kernel [kh, kw, in/g, out]
  torch linear weight [out, in]               -> flax kernel [in, out]
  torch BN {weight,bias,running_mean,running_var} ->
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
