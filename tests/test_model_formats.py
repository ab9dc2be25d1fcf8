"""Vendor-free weight-format readers + importers.

No real weights are downloadable in this environment (zero egress), so each
format is validated by synthetic round-trip fixtures: the test WRITES a
structurally-faithful caffemodel / frozen GraphDef / OpenVINO IR with the
module's own encoders, reads it back, imports it into the flax tree, and —
for the CaffeNet path — proves numerical parity against a torch NCHW replica
(torch Conv2d/ceil-mode pool/LRN semantics match caffe's).
"""
import numpy as np
import pytest

from face_detection_and_recognition_tpu.utils import model_formats as MF
from face_detection_and_recognition_tpu.utils import weights as W


def _rand(rng, *shape, scale=0.05):
    return (rng.randn(*shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# caffemodel wire format
# ---------------------------------------------------------------------------


def test_caffemodel_roundtrip_v2(rng):
    layers = [
        MF.CaffeLayer("conv1", "Convolution",
                      [_rand(rng, 8, 3, 3, 3), _rand(rng, 8)]),
        MF.CaffeLayer("relu1", "ReLU", []),
        MF.CaffeLayer("fc", "InnerProduct",
                      [_rand(rng, 4, 32), _rand(rng, 4)]),
    ]
    buf = MF.write_caffemodel(layers)
    back = MF.read_caffemodel(buf)
    assert [(l.name, l.type, len(l.blobs)) for l in back] == [
        ("conv1", "Convolution", 2), ("relu1", "ReLU", 0),
        ("fc", "InnerProduct", 2)]
    for a, b in zip(layers, back):
        for x, y in zip(a.blobs, b.blobs):
            np.testing.assert_array_equal(x, y)


def test_caffemodel_roundtrip_v1_legacy(rng):
    layers = [MF.CaffeLayer("conv1", "Convolution",
                            [_rand(rng, 4, 3, 5, 5), _rand(rng, 4)])]
    back = MF.read_caffemodel(MF.write_caffemodel(layers, v1=True))
    assert back[0].type == "Convolution" and back[0].name == "conv1"
    np.testing.assert_array_equal(back[0].blobs[0], layers[0].blobs[0])


def _caffenet_fixture(rng, num_classes=8):
    """Full-size Levi-Hassner CaffeNet blobs (the real age_net geometry:
    fc6 input 384*7*7 = 18816)."""
    return [
        MF.CaffeLayer("conv1", "Convolution",
                      [_rand(rng, 96, 3, 7, 7), _rand(rng, 96)]),
        MF.CaffeLayer("pool1", "Pooling", []),
        MF.CaffeLayer("norm1", "LRN", []),
        MF.CaffeLayer("conv2", "Convolution",
                      [_rand(rng, 256, 96, 5, 5), _rand(rng, 256)]),
        MF.CaffeLayer("conv3", "Convolution",
                      [_rand(rng, 384, 256, 3, 3), _rand(rng, 384)]),
        MF.CaffeLayer("fc6", "InnerProduct",
                      [_rand(rng, 512, 18816, scale=0.01), _rand(rng, 512)]),
        MF.CaffeLayer("fc7", "InnerProduct",
                      [_rand(rng, 512, 512, scale=0.01), _rand(rng, 512)]),
        MF.CaffeLayer("fc8", "InnerProduct",
                      [_rand(rng, num_classes, 512), _rand(rng, num_classes)]),
    ]


def test_caffenet_import_matches_torch_oracle(rng):
    """Import a synthetic age_net.caffemodel and prove our NHWC CaffeNetHead
    with the imported params equals a torch NCHW CaffeNet (== caffe
    semantics: ceil-mode pooling, cross-channel LRN, channel-major flatten)
    on the same input."""
    import torch

    from face_detection_and_recognition_tpu.models.age_gender import CaffeNetHead

    layers = MF.read_caffemodel(MF.write_caffemodel(_caffenet_fixture(rng)))
    variables = W.convert_caffenet_head(layers, num_classes=8)

    x = rng.randn(2, 227, 227, 3).astype(np.float32) * 20.0
    ours = np.asarray(CaffeNetHead(num_classes=8).apply(variables, x))

    tnet = torch.nn.Sequential(
        torch.nn.Conv2d(3, 96, 7, 4), torch.nn.ReLU(),
        torch.nn.MaxPool2d(3, 2, ceil_mode=True),
        torch.nn.LocalResponseNorm(5, alpha=1e-4, beta=0.75, k=1.0),
        torch.nn.Conv2d(96, 256, 5, padding=2), torch.nn.ReLU(),
        torch.nn.MaxPool2d(3, 2, ceil_mode=True),
        torch.nn.LocalResponseNorm(5, alpha=1e-4, beta=0.75, k=1.0),
        torch.nn.Conv2d(256, 384, 3, padding=1), torch.nn.ReLU(),
        torch.nn.MaxPool2d(3, 2, ceil_mode=True),
        torch.nn.Flatten(),
        torch.nn.Linear(18816, 512), torch.nn.ReLU(),
        torch.nn.Linear(512, 512), torch.nn.ReLU(),
        torch.nn.Linear(512, 8),
    )
    conv_idx, fc_idx = [0, 4, 8], [12, 14, 16]
    convs = [l for l in layers if l.type == "Convolution"]
    fcs = [l for l in layers if l.type == "InnerProduct"]
    with torch.no_grad():
        for ti, l in zip(conv_idx, convs):
            tnet[ti].weight.copy_(torch.from_numpy(l.blobs[0]))
            tnet[ti].bias.copy_(torch.from_numpy(l.blobs[1]))
        for ti, l in zip(fc_idx, fcs):
            tnet[ti].weight.copy_(torch.from_numpy(l.blobs[0]))
            tnet[ti].bias.copy_(torch.from_numpy(l.blobs[1]))
        theirs = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_caffenet_import_rejects_wrong_class_count(rng):
    layers = MF.read_caffemodel(MF.write_caffemodel(_caffenet_fixture(rng, 2)))
    with pytest.raises(ValueError, match="output classes"):
        W.convert_caffenet_head(layers, num_classes=8)


def test_caffe_bn_scale_pairing(rng):
    """BatchNorm mean/var are stored scaled by blob[2]; the following Scale
    layer carries gamma/beta. caffe_layers_to_arrays must unscale and order
    them gamma, beta, mean, var."""
    mean, var = _rand(rng, 16), np.abs(_rand(rng, 16)) + 1.0
    gamma, beta = _rand(rng, 16), _rand(rng, 16)
    sf = 999.0
    layers = [
        MF.CaffeLayer("conv", "Convolution", [_rand(rng, 16, 3, 3, 3)]),
        MF.CaffeLayer("bn", "BatchNorm",
                      [mean * sf, var * sf, np.asarray([sf], np.float32)]),
        MF.CaffeLayer("scale", "Scale", [gamma, beta]),
    ]
    arrays = W.caffe_layers_to_arrays(layers)
    assert len(arrays) == 5
    assert arrays[0].shape == (3, 3, 3, 16)     # OIHW -> HWIO
    np.testing.assert_allclose(arrays[1], gamma)
    np.testing.assert_allclose(arrays[2], beta)
    np.testing.assert_allclose(arrays[3], mean, rtol=1e-6)
    np.testing.assert_allclose(arrays[4], var, rtol=1e-6)


# ---------------------------------------------------------------------------
# structural import into registry models
# ---------------------------------------------------------------------------


def test_ssd_resnet10_caffemodel_entry_path(rng):
    """The documented real-weight path for ssd-resnet10: caffemodel ->
    caffe_layers_to_arrays -> structural_import -> detect still runs and the
    imported leaves are bit-identical."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.ssd import (
        SSDConfig, make_ssd_face,
    )

    cfg = SSDConfig(backbone="resnet10", input_size=(96, 96), keep_top_k=16)
    net, variables, detect = make_ssd_face(cfg)

    # fabricate a caffemodel streaming layers in true EXECUTION order (what
    # a real file does), not flax's alphabetical tree order
    order = W.execution_module_order(net, variables, (1, 96, 96, 3))
    slots = W.ordered_slots(variables, order)
    layers, i = [], 0
    while i < len(slots):
        path, leaf, shape, _ = slots[i]
        if leaf == "kernel" and len(shape) == 4:
            blobs = [_rand(rng, shape[3], shape[2], shape[0], shape[1])]
            if i + 1 < len(slots) and slots[i + 1][1] == "bias" \
                    and slots[i + 1][0] == path:
                blobs.append(_rand(rng, shape[3]))
                i += 1
            layers.append(MF.CaffeLayer(f"conv_{len(layers)}", "Convolution",
                                        blobs))
            # a following BatchNorm module? emit BatchNorm+Scale layers
            if i + 1 < len(slots) and slots[i + 1][1] == "scale":
                c = shape[3]
                layers.append(MF.CaffeLayer(
                    f"bn_{len(layers)}", "BatchNorm",
                    [_rand(rng, c), np.abs(_rand(rng, c)) + 1.0,
                     np.ones(1, np.float32)]))
                layers.append(MF.CaffeLayer(
                    f"scale_{len(layers)}", "Scale",
                    [_rand(rng, c) + 1.0, _rand(rng, c)]))
                i += 4  # scale, bias, mean, var slots
        i += 1

    parsed = MF.read_caffemodel(MF.write_caffemodel(layers))
    arrays = W.caffe_layers_to_arrays(parsed)
    imported = W.structural_import(arrays, variables, module_order=order)

    # every leaf replaced, shapes intact, detector still executes
    dets, valid = detect(imported, jnp.zeros((1, 96, 96, 3), jnp.float32))
    assert dets.shape[0] == 1 and bool(np.isfinite(np.asarray(dets)).all())
    # spot-check: first conv kernel round-trips through OIHW->HWIO exactly
    first_kernel = W.c2f_conv(parsed[0].blobs[0])
    got = imported["params"]
    for k in ("backbone", "ConvBN_0", "Conv_0"):
        got = got[k] if k in got else got[next(iter(got))]
    np.testing.assert_array_equal(np.asarray(got["kernel"]), first_kernel)


def test_structural_import_shape_mismatch_names_path(rng):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(nn.Conv(8, (3, 3))(x).mean((1, 2)))

    v = jax.jit(Tiny().init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, 8, 8, 3)))
    good = [_rand(rng, 3, 3, 3, 8), _rand(rng, 8), _rand(rng, 8, 4),
            _rand(rng, 4)]
    out = W.structural_import(good, v)
    np.testing.assert_array_equal(out["params"]["Conv_0"]["kernel"], good[0])
    bad = [good[0], good[1], _rand(rng, 4, 8), good[3]]
    with pytest.raises(ValueError, match="Dense_0/kernel"):
        W.structural_import(bad, v)
    with pytest.raises(ValueError, match="leaves"):
        W.structural_import(good[:-1], v)


# ---------------------------------------------------------------------------
# frozen GraphDef -> MTCNN
# ---------------------------------------------------------------------------


def test_graphdef_roundtrip(rng):
    consts = [MF.GraphConst("pnet/conv1/weights", _rand(rng, 3, 3, 3, 10)),
              MF.GraphConst("pnet/conv1/bias", _rand(rng, 10)),
              MF.GraphConst("counts", np.arange(6, dtype=np.int32))]
    back = MF.read_tf_graphdef(MF.write_graphdef(consts))
    assert [c.name for c in back] == [c.name for c in consts]
    for a, b in zip(consts, back):
        np.testing.assert_array_equal(a.value, b.value)
        assert a.value.dtype == b.value.dtype


def test_mtcnn_graphdef_entry_path(rng):
    """Documented real-weight path for mtcnn: frozen .pb -> read_tf_graphdef
    -> convert_mtcnn_graphdef. Consts are emitted in graph (execution)
    order with realistic blaueck-style names; the importer must land every
    tensor on the right P/R/O-Net slot."""
    from face_detection_and_recognition_tpu.models.mtcnn import MTCNN

    cascade = MTCNN()
    variables = cascade.variables()

    consts = []
    for stage in ("pnet", "rnet", "onet"):
        params = variables[stage]["params"]
        for path, leaf, shape, _ in W._walk_slots(params, {}):
            kind = {"kernel": "weights", "bias": "biases",
                    "alpha": "alpha"}[leaf]
            name = f"{stage}/{'/'.join(path)}/{kind}"
            consts.append(MF.GraphConst(name, _rand(rng, *shape)))

    parsed = MF.read_tf_graphdef(MF.write_graphdef(consts))
    imported = W.convert_mtcnn_graphdef(parsed, variables)

    by_name = {c.name: c.value for c in consts}
    np.testing.assert_array_equal(
        imported["pnet"]["params"]["Conv_0"]["kernel"],
        by_name["pnet/Conv_0/weights"])
    np.testing.assert_array_equal(
        imported["onet"]["params"]["Dense_3"]["bias"],
        by_name["onet/Dense_3/biases"])
    np.testing.assert_array_equal(
        imported["rnet"]["params"]["PReLU_2"]["alpha"],
        by_name["rnet/PReLU_2/alpha"])

    # cascade actually runs with the imported weights
    img = rng.randint(0, 255, (80, 80, 3)).astype(np.uint8)
    dets, valid = cascade(imported, img)
    assert np.isfinite(np.asarray(dets)).all()


def test_mtcnn_graphdef_missing_stage_raises(rng):
    from face_detection_and_recognition_tpu.models.mtcnn import MTCNN

    variables = MTCNN().variables()
    pnet_consts = [
        MF.GraphConst(f"pnet/{'/'.join(path)}/{leaf}", _rand(rng, *shape))
        for path, leaf, shape, _ in W._walk_slots(
            variables["pnet"]["params"], {})
    ]
    with pytest.raises(ValueError, match="rnet"):
        W.convert_mtcnn_graphdef(pnet_consts, variables)


# ---------------------------------------------------------------------------
# OpenVINO IR
# ---------------------------------------------------------------------------


def test_openvino_ir_roundtrip(rng):
    consts = [MF.GraphConst("w0", _rand(rng, 8, 3, 3, 3)),
              MF.GraphConst("b0", _rand(rng, 8))]
    xml, blob = MF.write_openvino_ir(consts)
    back = MF.read_openvino_ir(xml, blob)
    assert [c.name for c in back] == ["w0", "b0"]
    for a, b in zip(consts, back):
        np.testing.assert_array_equal(a.value, b.value)


def test_openvino_ir_v7_blobs_style(rng):
    """Old-IR <blobs><weights/><biases/></blobs> layers parse too."""
    w = _rand(rng, 4, 3, 3, 3)
    b = _rand(rng, 4)
    blob = w.tobytes() + b.tobytes()
    xml = (
        '<net name="n" version="7"><layers>'
        f'<layer id="0" name="conv1" type="Convolution" precision="FP32">'
        f'<blobs><weights offset="0" size="{w.nbytes}"/>'
        f'<biases offset="{w.nbytes}" size="{b.nbytes}"/></blobs>'
        "</layer></layers></net>"
    ).encode()
    back = MF.read_openvino_ir(xml, blob)
    assert [c.name for c in back] == ["conv1/weights", "conv1/biases"]
    np.testing.assert_array_equal(back[0].value, w.reshape(-1))
    np.testing.assert_array_equal(back[1].value, b)


def test_ir_structural_import_reid_embedder(rng):
    """Documented real-weight path for the OpenVINO reid embedder: IR consts
    (OIHW kernels) -> transpose -> structural_import."""
    from face_detection_and_recognition_tpu.models.embedders import get_embedder

    net, variables, embed = get_embedder("reid-mnv2").build()
    order = W.execution_module_order(net, variables, (1, 128, 128, 3))
    slots = W.ordered_slots(variables, order)
    arrays = []
    for path, leaf, shape, _ in slots:
        if leaf == "kernel" and len(shape) == 4:
            arrays.append(W.c2f_conv(
                _rand(rng, shape[3], shape[2], shape[0], shape[1])))
        elif leaf == "kernel":
            arrays.append(_rand(rng, *shape))
        else:
            arrays.append(np.abs(_rand(rng, *shape)) + 0.5
                          if leaf == "var" else _rand(rng, *shape))
    imported = W.structural_import(arrays, variables, module_order=order)
    out = embed(imported, np.zeros((1, 128, 128, 3), np.float32))
    assert out.shape == (1, 256) and np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# engine.load_weights dispatch (the user-facing entry for every format)
# ---------------------------------------------------------------------------


def test_engine_load_weights_pb_and_caffemodel(tmp_path, rng):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)

    # mtcnn <- frozen GraphDef
    eng = FaceEngine(EngineConfig(detector="mtcnn", max_det=8))
    consts = []
    for stage in ("pnet", "rnet", "onet"):
        for path, leaf, shape, _ in W._walk_slots(
                eng.variables[stage]["params"], {}):
            consts.append(MF.GraphConst(
                f"{stage}/{'/'.join(path)}/{leaf}", _rand(rng, *shape)))
    pb = tmp_path / "mtcnn.pb"
    pb.write_bytes(MF.write_graphdef(consts))
    eng.load_weights(str(pb))
    np.testing.assert_array_equal(
        eng.variables["pnet"]["params"]["Conv_0"]["kernel"],
        consts[0].value)

    # ssd-resnet10 <- caffemodel (kernel-only conv + BN/Scale stream)
    eng2 = FaceEngine(EngineConfig(
        detector="ssd-resnet10", max_det=8,
        detector_overrides={"input_size": (96, 96)},
    ))
    slots = W.ordered_slots(eng2.variables, eng2._execution_order())
    layers, i = [], 0
    while i < len(slots):
        path, leaf, shape, _ = slots[i]
        if leaf == "kernel" and len(shape) == 4:
            blobs = [_rand(rng, shape[3], shape[2], shape[0], shape[1])]
            if i + 1 < len(slots) and slots[i + 1][1] == "bias" \
                    and slots[i + 1][0] == path:
                blobs.append(_rand(rng, shape[3]))
                i += 1
            layers.append(MF.CaffeLayer(f"c{len(layers)}", "Convolution",
                                        blobs))
            if i + 1 < len(slots) and slots[i + 1][1] == "scale":
                c = shape[3]
                layers.append(MF.CaffeLayer(
                    f"bn{len(layers)}", "BatchNorm",
                    [_rand(rng, c), np.abs(_rand(rng, c)) + 1.0,
                     np.ones(1, np.float32)]))
                layers.append(MF.CaffeLayer(
                    f"s{len(layers)}", "Scale",
                    [_rand(rng, c) + 1.0, _rand(rng, c)]))
                i += 4
        i += 1
    cm = tmp_path / "res10.caffemodel"
    cm.write_bytes(MF.write_caffemodel(layers))
    eng2.load_weights(str(cm))
    got = eng2.detect_image(rng.randint(0, 255, (64, 64, 3)).astype(np.uint8))
    assert got is not None  # pipeline re-traced and ran with loaded weights


def test_structural_import_uses_execution_order(rng):
    """Regression (round-2 review): flax sorts siblings alphabetically, so
    a multi-branch net (mobilenetv2: final ConvBN_1 executes LAST but sorts
    second; heads interleave loc/conf) would misassign a real weight stream
    without execution ordering."""
    from face_detection_and_recognition_tpu.models.ssd import (
        SSDConfig, make_ssd_face,
    )

    cfg = SSDConfig(backbone="mobilenetv2", input_size=(64, 64), keep_top_k=8)
    net, variables, _ = make_ssd_face(cfg)
    order = W.execution_module_order(net, variables, (1, 64, 64, 3))
    slots = W.ordered_slots(variables, order)
    paths = [s[0] for s in slots]
    # the backbone's final ConvBN_1 must come AFTER every inverted residual
    bb = "_MobileNetV2Backbone_0"
    conv1_last = max(i for i, p in enumerate(paths)
                     if len(p) > 1 and p[0] == bb and p[1] == "ConvBN_1")
    any_ir = min(i for i, p in enumerate(paths)
                 if len(p) > 1 and p[0] == bb
                 and p[1].startswith("_InvertedResidual"))
    assert conv1_last > any_ir, "execution order not honored"
    # heads interleave loc0, conf0, loc1, conf1, ...
    head_seq = [p[0] for p in paths if p and p[0].startswith(("loc", "conf"))]
    dedup = list(dict.fromkeys(head_seq))
    assert dedup == ["loc0", "conf0", "loc1", "conf1",
                     "loc2", "conf2", "loc3", "conf3"]


def test_readers_reject_garbage(rng):
    """Random bytes must fail with a clear ValueError, never raw index
    errors or silent nonsense."""
    for _ in range(25):
        blob = rng.bytes(rng.randint(1, 300))
        for fn in (MF.read_caffemodel, MF.read_tf_graphdef):
            try:
                out = fn(blob)
                assert isinstance(out, list)  # benign parse -> empty-ish ok
            except ValueError:
                pass


def test_mtcnn_graphdef_reordered_consts(rng):
    """Adversarial const ordering: a .pb whose same-shape 1-D consts
    (bias vs PReLU alpha) are serialized in a DIFFERENT order than
    execution must still pour correctly — name-kind matching, not
    serialization order, decides (VERDICT r2 weak #7)."""
    from face_detection_and_recognition_tpu.models.mtcnn import MTCNN

    cascade = MTCNN()
    variables = cascade.variables()

    consts = []
    for stage in ("pnet", "rnet", "onet"):
        params = variables[stage]["params"]
        stage_consts = []
        for path, leaf, shape, _ in W._walk_slots(params, {}):
            kind = {"kernel": "weights", "bias": "biases",
                    "alpha": "alpha"}[leaf]
            name = f"{stage}/{'/'.join(path)}/{kind}"
            stage_consts.append(MF.GraphConst(name, _rand(rng, *shape)))
        # adversarial: alphas first, then biases, then kernels — any
        # shape-by-order matcher transposes the 1-D pairs
        stage_consts.sort(key=lambda c: {"alpha": 0, "biases": 1,
                                         "weights": 2}[c.name.rsplit("/", 1)[-1]])
        consts.extend(stage_consts)

    parsed = MF.read_tf_graphdef(MF.write_graphdef(consts))
    imported = W.convert_mtcnn_graphdef(parsed, variables)
    by_name = {c.name: c.value for c in consts}
    # biases and alphas of equal width landed on their OWN slots
    np.testing.assert_array_equal(
        imported["pnet"]["params"]["Conv_0"]["bias"],
        by_name["pnet/Conv_0/biases"])
    np.testing.assert_array_equal(
        imported["pnet"]["params"]["PReLU_0"]["alpha"],
        by_name["pnet/PReLU_0/alpha"])
    np.testing.assert_array_equal(
        imported["onet"]["params"]["PReLU_3"]["alpha"],
        by_name["onet/PReLU_3/alpha"])


def test_tensor_proto_negative_int_and_half(rng):
    """Unpacked VARINT semantics: int_val negatives arrive as 64-bit
    two's-complement varints, half_val holds float16 BIT PATTERNS."""
    from face_detection_and_recognition_tpu.utils import model_formats as MF

    varint_field = MF._varint_field
    len_field = MF._len_field

    # int32 Const with value -1 (dtype=DT_INT32=3, shape [2], splat int_val)
    shape = len_field(2, len_field(2, varint_field(1, 2)))
    proto = varint_field(1, 3) + shape + varint_field(7, -1)
    arr = MF._parse_tensor_proto(proto)
    assert arr.dtype == np.int32
    np.testing.assert_array_equal(arr, [-1, -1])

    # DT_HALF (19) splat: bit pattern 0x3C00 == float16(1.0)
    shape = len_field(2, len_field(2, varint_field(1, 3)))
    proto = varint_field(1, 19) + shape + varint_field(13, 0x3C00)
    arr = MF._parse_tensor_proto(proto)
    assert arr.dtype == np.float16
    np.testing.assert_array_equal(arr, np.full(3, 1.0, np.float16))


def test_walk_slots_natural_order():
    """>= 10 auto-numbered siblings pour in numeric order (Conv_2 before
    Conv_10); plain string sort silently transposed repeated blocks."""
    from face_detection_and_recognition_tpu.utils import weights as W

    params = {f"Conv_{i}": {"kernel": np.zeros((1, 1, 1, i + 1))}
              for i in range(12)}
    order = [path[0] for path, leaf, _, _ in W._walk_slots(params, {})]
    assert order == [f"Conv_{i}" for i in range(12)]
