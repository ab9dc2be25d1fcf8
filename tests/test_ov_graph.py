"""OpenVINO IR graph executor: op semantics + SSD detect plumbing.

Validates the executor against hand-computed jnp references on fixture IRs
that exercise the exact op chain the reference's real IRs use
(face-detection-0204-style PriorBoxClustered SSD head, reid-style
conv->pool->matmul embedder), plus the write/parse roundtrip."""
import numpy as np
import pytest

from face_detection_and_recognition_tpu.models.ov_graph import (
    OVGraphNet, make_ov_detect, priorbox_clustered)
from face_detection_and_recognition_tpu.utils.ir_graph import (
    IRLayer, parse_ir_graph, write_ir_graph)


def _const(lid, name, value):
    return IRLayer(id=lid, name=name, type="Const", attrs={},
                   value=np.asarray(value), output_ports=[0],
                   port_dims={0: list(np.asarray(value).shape)})


def test_ir_write_parse_roundtrip(rng):
    w = rng.randn(8, 3, 3, 3).astype(np.float32)
    layers = [
        IRLayer(id=0, name="image", type="Parameter",
                attrs={"shape": "1,3,16,16", "element_type": "f32"},
                output_ports=[0], port_dims={0: [1, 3, 16, 16]}),
        _const(1, "w1", w),
        IRLayer(id=2, name="conv", type="Convolution",
                attrs={"strides": "1,1", "pads_begin": "1,1",
                       "pads_end": "1,1", "dilations": "1,1"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, 8, 16, 16]}),
        IRLayer(id=3, name="out", type="Result", input_ports=[0]),
    ]
    edges = {(2, 0): (0, 0), (2, 1): (1, 0), (3, 0): (2, 2)}
    xml, blob = write_ir_graph(layers, edges)
    g = parse_ir_graph(xml, blob)
    assert [L.type for L in g.layers] == ["Parameter", "Const",
                                          "Convolution", "Result"]
    np.testing.assert_allclose(g.layers[1].value, w)
    assert g.edges[(2, 1)] == (1, 0)


def test_executor_conv_group_add_clamp_matches_manual(rng):
    import jax
    import jax.numpy as jnp

    w = rng.randn(8, 3, 3, 3).astype(np.float32) * 0.3
    b = rng.randn(1, 8, 1, 1).astype(np.float32)
    gw = rng.randn(8, 1, 1, 3, 3).astype(np.float32) * 0.3  # depthwise G=8
    layers = [
        IRLayer(id=0, name="image", type="Parameter",
                attrs={"shape": "1,3,16,16"}, output_ports=[0],
                port_dims={0: [1, 3, 16, 16]}),
        _const(1, "w1", w),
        IRLayer(id=2, name="conv1", type="Convolution",
                attrs={"strides": "2,2", "pads_begin": "1,1",
                       "pads_end": "1,1", "dilations": "1,1"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, 8, 8, 8]}),
        _const(3, "b1", b),
        IRLayer(id=4, name="add1", type="Add", input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, 8, 8, 8]}),
        IRLayer(id=5, name="relu6", type="Clamp",
                attrs={"min": "0", "max": "6"}, input_ports=[0],
                output_ports=[1], port_dims={1: [1, 8, 8, 8]}),
        _const(6, "gw", gw),
        IRLayer(id=7, name="dw", type="GroupConvolution",
                attrs={"strides": "1,1", "pads_begin": "1,1",
                       "pads_end": "1,1", "dilations": "1,1"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, 8, 8, 8]}),
        IRLayer(id=8, name="out", type="Result", input_ports=[0]),
    ]
    edges = {(2, 0): (0, 0), (2, 1): (1, 0), (4, 0): (2, 2), (4, 1): (3, 0),
             (5, 0): (4, 2), (7, 0): (5, 1), (7, 1): (6, 0), (8, 0): (7, 2)}
    net = OVGraphNet(parse_ir_graph(*write_ir_graph(layers, edges)))
    x = rng.randn(1, 16, 16, 3).astype(np.float32)
    out = np.asarray(net.apply(net.init_variables(),
                               jnp.asarray(x))[net.outputs[0]])

    # manual NHWC reference
    def conv(xx, ww, stride, groups=1):
        return jax.lax.conv_general_dilated(
            xx, jnp.transpose(ww, (2, 3, 1, 0)), (stride, stride),
            [(1, 1), (1, 1)], feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = conv(jnp.asarray(x), jnp.asarray(w), 2)
    ref = ref + jnp.asarray(b.transpose(0, 2, 3, 1))
    ref = jnp.clip(ref, 0, 6)
    ref = conv(ref, jnp.asarray(gw.reshape(8, 1, 3, 3)), 1, groups=8)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


def test_priorbox_clustered_math():
    corners, var = priorbox_clustered(
        2, 2, 100, 100, {"width": "10,20", "height": "10,30",
                         "step": "50", "offset": "0.5",
                         "variance": "0.1,0.1,0.2,0.2", "clip": "0"})
    assert corners.shape == (2 * 2 * 2, 4)
    # first cell center (25, 25): 10x10 box -> (0.2, 0.2, 0.3, 0.3)
    np.testing.assert_allclose(corners[0], [0.2, 0.2, 0.3, 0.3], atol=1e-6)
    np.testing.assert_allclose(corners[1], [0.15, 0.10, 0.35, 0.40],
                               atol=1e-6)
    np.testing.assert_allclose(var[0], [0.1, 0.1, 0.2, 0.2])


def _ssd_fixture(rng, grid=4, npc=2, img=32):
    """A minimal face-detection-0204-style IR: conv backbone -> loc/conf
    heads -> Transpose->Reshape->Concat -> SoftMax -> DetectionOutput with
    PriorBoxClustered anchors."""
    c = 8
    wback = rng.randn(c, 3, 3, 3).astype(np.float32) * 0.2
    wloc = rng.randn(npc * 4, c, 1, 1).astype(np.float32) * 0.1
    wconf = rng.randn(npc * 2, c, 1, 1).astype(np.float32) * 0.1
    n = grid * grid * npc
    layers = [
        IRLayer(id=0, name="image", type="Parameter",
                attrs={"shape": f"1,3,{img},{img}"}, output_ports=[0],
                port_dims={0: [1, 3, img, img]}),
        _const(1, "wback", wback),
        IRLayer(id=2, name="backbone", type="Convolution",
                attrs={"strides": "8,8", "pads_begin": "1,1",
                       "pads_end": "1,1", "dilations": "1,1"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, c, grid, grid]}),
        _const(3, "wloc", wloc),
        IRLayer(id=4, name="loc", type="Convolution",
                attrs={"strides": "1,1", "pads_begin": "0,0",
                       "pads_end": "0,0", "dilations": "1,1"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, npc * 4, grid, grid]}),
        _const(5, "wconf", wconf),
        IRLayer(id=6, name="conf", type="Convolution",
                attrs={"strides": "1,1", "pads_begin": "0,0",
                       "pads_end": "0,0", "dilations": "1,1"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, npc * 2, grid, grid]}),
        _const(7, "perm", np.asarray([0, 2, 3, 1], np.int64)),
        IRLayer(id=8, name="loc_t", type="Transpose", input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, grid, grid, npc * 4]}),
        _const(9, "locshape", np.asarray([1, -1], np.int64)),
        IRLayer(id=10, name="loc_flat", type="Reshape",
                attrs={"special_zero": "true"}, input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, n * 4]}),
        _const(11, "perm2", np.asarray([0, 2, 3, 1], np.int64)),
        IRLayer(id=12, name="conf_t", type="Transpose", input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, grid, grid, npc * 2]}),
        _const(13, "confshape", np.asarray([1, -1, 2], np.int64)),
        IRLayer(id=14, name="conf_r", type="Reshape",
                attrs={"special_zero": "true"}, input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, n, 2]}),
        IRLayer(id=15, name="conf_sm", type="SoftMax", attrs={"axis": "2"},
                input_ports=[0], output_ports=[1],
                port_dims={1: [1, n, 2]}),
        _const(16, "confflat", np.asarray([1, -1], np.int64)),
        IRLayer(id=17, name="conf_flat", type="Reshape",
                attrs={"special_zero": "true"}, input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, n * 2]}),
        IRLayer(id=18, name="priors", type="PriorBoxClustered",
                attrs={"width": "8,16", "height": "8,24", "step": "8",
                       "offset": "0.5", "variance": "0.1,0.1,0.2,0.2",
                       "clip": "0"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, 2, n * 4]}),
        IRLayer(id=19, name="detection_out", type="DetectionOutput",
                attrs={"num_classes": "2", "background_label_id": "0",
                       "nms_threshold": "0.45", "top_k": "16",
                       "keep_top_k": "8", "confidence_threshold": "0.01"},
                input_ports=[0, 1, 2], output_ports=[3],
                port_dims={3: [1, 1, 8, 7]}),
        IRLayer(id=20, name="out", type="Result", input_ports=[0]),
    ]
    edges = {
        (2, 0): (0, 0), (2, 1): (1, 0),
        (4, 0): (2, 2), (4, 1): (3, 0),
        (6, 0): (2, 2), (6, 1): (5, 0),
        (8, 0): (4, 2), (8, 1): (7, 0),
        (10, 0): (8, 2), (10, 1): (9, 0),
        (12, 0): (6, 2), (12, 1): (11, 0),
        (14, 0): (12, 2), (14, 1): (13, 0),
        (15, 0): (14, 2),
        (17, 0): (15, 1), (17, 1): (16, 0),
        (18, 0): (2, 2), (18, 1): (0, 0),
        (19, 0): (10, 2), (19, 1): (17, 2), (19, 2): (18, 2),
        (20, 0): (19, 3),
    }
    return layers, edges, (wback, wloc, wconf)


def test_ssd_ir_detect_end_to_end(rng):
    import jax.numpy as jnp

    layers, edges, _ = _ssd_fixture(rng)
    g = parse_ir_graph(*write_ir_graph(layers, edges))
    net = OVGraphNet(g)
    assert net.priors.shape == (32, 4)
    assert net.detection_cfg["keep_top_k"] == 8
    detect = make_ov_detect(net)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    dets, valid = detect(net.init_variables(), x)
    assert dets.shape == (1, 8, 5) and valid.shape == (1, 8)
    d = np.asarray(dets)
    assert np.isfinite(d).all()
    v = np.asarray(valid)
    if v.any():  # scores sorted desc among valid rows
        scores = d[0, v[0], 4]
        assert (np.diff(scores) <= 1e-6).all()


def test_ssd_ir_loc_conf_match_manual(rng):
    """The flattened loc vector and softmaxed conf must equal a manual NCHW
    computation — pinning the Transpose/Reshape layout handling."""
    import jax
    import jax.numpy as jnp

    layers, edges, (wback, wloc, wconf) = _ssd_fixture(rng)
    g = parse_ir_graph(*write_ir_graph(layers, edges))
    net = OVGraphNet(g)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    loc, conf = net.apply(net.init_variables(),
                          jnp.asarray(x))[net.outputs[0]]

    def conv(xx, ww, stride, pad):
        return jax.lax.conv_general_dilated(
            xx, jnp.transpose(jnp.asarray(ww), (2, 3, 1, 0)),
            (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    f = conv(jnp.asarray(x), wback, 8, 1)
    loc_ref = conv(f, wloc, 1, 0)          # NHWC == transposed NCHW head
    conf_ref = conv(f, wconf, 1, 0)
    np.testing.assert_allclose(np.asarray(loc).reshape(-1),
                               np.asarray(loc_ref).reshape(-1), atol=1e-5)
    sm = jax.nn.softmax(np.asarray(conf_ref).reshape(1, -1, 2), axis=2)
    np.testing.assert_allclose(np.asarray(conf).reshape(1, -1, 2),
                               np.asarray(sm), atol=1e-5)


def test_embedder_ir_matmul_reduce(rng):
    """reid-style tail: conv -> ReduceMean(H,W) -> MatMul -> L2-ready vec."""
    import jax.numpy as jnp

    w = rng.randn(16, 3, 3, 3).astype(np.float32) * 0.2
    fc = rng.randn(16, 32).astype(np.float32) * 0.2
    layers = [
        IRLayer(id=0, name="image", type="Parameter",
                attrs={"shape": "1,3,8,8"}, output_ports=[0],
                port_dims={0: [1, 3, 8, 8]}),
        _const(1, "w", w),
        IRLayer(id=2, name="conv", type="Convolution",
                attrs={"strides": "1,1", "pads_begin": "1,1",
                       "pads_end": "1,1", "dilations": "1,1"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, 16, 8, 8]}),
        _const(3, "axes", np.asarray([2, 3], np.int64)),
        IRLayer(id=4, name="gap", type="ReduceMean",
                attrs={"keep_dims": "false"}, input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, 16]}),
        _const(5, "fc", fc),
        IRLayer(id=6, name="proj", type="MatMul",
                attrs={"transpose_a": "false", "transpose_b": "false"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, 32]}),
        IRLayer(id=7, name="out", type="Result", input_ports=[0]),
    ]
    edges = {(2, 0): (0, 0), (2, 1): (1, 0), (4, 0): (2, 2), (4, 1): (3, 0),
             (6, 0): (4, 2), (6, 1): (5, 0), (7, 0): (6, 2)}
    net = OVGraphNet(parse_ir_graph(*write_ir_graph(layers, edges)))
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    out = np.asarray(net.apply(net.init_variables(),
                               jnp.asarray(x))[net.outputs[0]])
    import jax

    f = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.transpose(jnp.asarray(w), (2, 3, 1, 0)), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = jnp.mean(f, axis=(1, 2)) @ jnp.asarray(fc)
    assert out.shape == (1, 32)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


def test_reduce_mean_keepdims_then_squeeze(rng):
    """ReduceMean(keep_dims=true) stays channels-last internally; a
    downstream Squeeze over the IR's NCHW axes [2,3] must still remove the
    spatial dims (layout-tracking regression)."""
    import jax
    import jax.numpy as jnp

    w = rng.randn(16, 3, 3, 3).astype(np.float32) * 0.2
    layers = [
        IRLayer(id=0, name="image", type="Parameter",
                attrs={"shape": "1,3,8,8"}, output_ports=[0],
                port_dims={0: [1, 3, 8, 8]}),
        _const(1, "w", w),
        IRLayer(id=2, name="conv", type="Convolution",
                attrs={"strides": "1,1", "pads_begin": "1,1",
                       "pads_end": "1,1", "dilations": "1,1"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, 16, 8, 8]}),
        _const(3, "axes", np.asarray([2, 3], np.int64)),
        IRLayer(id=4, name="gap", type="ReduceMean",
                attrs={"keep_dims": "true"}, input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, 16, 1, 1]}),
        _const(5, "sq_axes", np.asarray([2, 3], np.int64)),
        IRLayer(id=6, name="sq", type="Squeeze", input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, 16]}),
        IRLayer(id=7, name="out", type="Result", input_ports=[0]),
    ]
    edges = {(2, 0): (0, 0), (2, 1): (1, 0), (4, 0): (2, 2), (4, 1): (3, 0),
             (6, 0): (4, 2), (6, 1): (5, 0), (7, 0): (6, 2)}
    net = OVGraphNet(parse_ir_graph(*write_ir_graph(layers, edges)))
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    out = np.asarray(net.apply(net.init_variables(),
                               jnp.asarray(x))[net.outputs[0]])
    f = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.transpose(jnp.asarray(w), (2, 3, 1, 0)), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = jnp.mean(f, axis=(1, 2))
    assert out.shape == (1, 16)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-5)


def test_engine_openvino_ir_entry_path(tmp_path, rng):
    """EngineConfig(detector='openvino-ir', detector_overrides={'xml': ...})
    executes a real model.xml end to end: input size read from the IR's
    Parameter, detect_image returns the reference contract."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)

    layers, edges, _ = _ssd_fixture(rng)
    xml, blob = write_ir_graph(layers, edges)
    xml_path = tmp_path / "model.xml"
    xml_path.write_bytes(xml)
    (tmp_path / "model.bin").write_bytes(blob)

    eng = FaceEngine(EngineConfig(
        detector="openvino-ir", det_thres=0.01, bbox_area_thres=0.0,
        max_det=8, detector_overrides={"xml": str(xml_path)}))
    assert eng.input_size == (32, 32)  # from the IR Parameter, not registry
    img = rng.randint(0, 255, (64, 48, 3)).astype(np.uint8)
    post = eng.detect_image(img)
    assert np.asarray(post.boxes).shape[1:] in ((4,), ())
    # reload through load_weights('.xml'): rebuilds the executor
    eng.load_weights(str(xml_path))
    post2 = eng.detect_image(img)
    np.testing.assert_allclose(np.asarray(post2.boxes),
                               np.asarray(post.boxes), atol=1e-4)


def test_detect_face_cli_openvino_ir(tmp_path, rng):
    """detect_face --md openvino-ir --ckpt model.xml: the unified CLI covers
    the reference's detect_face_openvino.py entry point with a REAL IR."""
    import cv2

    from face_detection_and_recognition_tpu.cli.detect_face import main

    layers, edges, _ = _ssd_fixture(rng)
    xml, blob = write_ir_graph(layers, edges)
    (tmp_path / "model.xml").write_bytes(xml)
    (tmp_path / "model.bin").write_bytes(blob)
    img = rng.randint(0, 255, (60, 80, 3)).astype(np.uint8)
    src = str(tmp_path / "in.jpg")
    cv2.imwrite(src, img)
    out = str(tmp_path / "out.jpg")
    rc = main(["-i", src, "--md", "openvino-ir",
               "--ckpt", str(tmp_path / "model.xml"),
               "--dt", "0.01", "--no-display", "-o", out])
    assert rc == 0
    assert cv2.imread(out) is not None


def test_interpolate_factor_from_port_dims(rng):
    """Interpolate reads its scale from the xml port dims (4x here) and
    rejects non-nearest modes — pre-round-3 it silently hardcoded 2x."""
    import jax.numpy as jnp

    def build(mode, out_hw):
        layers = [
            IRLayer(id=0, name="image", type="Parameter",
                    attrs={"shape": "1,3,4,4", "element_type": "f32"},
                    output_ports=[0], port_dims={0: [1, 3, 4, 4]}),
            IRLayer(id=1, name="up", type="Interpolate",
                    attrs={"mode": mode},
                    input_ports=[0], output_ports=[1],
                    port_dims={1: [1, 3, out_hw, out_hw]}),
            IRLayer(id=2, name="out", type="Result", input_ports=[0]),
        ]
        edges = {(1, 0): (0, 0), (2, 0): (1, 1)}
        xml, blob = write_ir_graph(layers, edges)
        return OVGraphNet(parse_ir_graph(xml, blob))

    net = build("nearest", 16)
    x = rng.randn(1, 4, 4, 3).astype(np.float32)
    out = net.apply(net.init_variables(), jnp.asarray(x))
    y = np.asarray(out[net.outputs[0]])
    assert y.shape == (1, 16, 16, 3)
    # nearest 4x: every source pixel becomes a 4x4 block
    np.testing.assert_allclose(y[0, :4, :4], np.broadcast_to(
        x[0, 0, 0], (4, 4, 3)))

    with pytest.raises(NotImplementedError):
        build("linear", 8)
    with pytest.raises(NotImplementedError):
        build("nearest", 6)  # non-integer 1.5x scale


def test_elementwise_after_reshape_keeps_nchw_layout(rng):
    """A binop/activation consuming a RESHAPE output (4-D, NCHW-logical)
    must broadcast its [1,C,1,1] const on axis 1 and must NOT mark the
    result channels-last — pre-round-3c the executor transposed the const
    and tagged every 4-D elementwise output hwc, silently mis-broadcasting
    ([1,3,16,1] + [1,1,1,3] -> [1,3,16,3]) on NCHW-logical tensors."""
    import jax.numpy as jnp

    bias = rng.randn(1, 3, 1, 1).astype(np.float32)
    layers = [
        IRLayer(id=0, name="image", type="Parameter",
                attrs={"shape": "1,3,4,4", "element_type": "f32"},
                output_ports=[0], port_dims={0: [1, 3, 4, 4]}),
        _const(1, "tgt", np.asarray([1, 3, 16, 1], np.int64)),
        IRLayer(id=2, name="resh", type="Reshape",
                attrs={"special_zero": "true"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, 3, 16, 1]}),
        _const(3, "bias", bias),
        IRLayer(id=4, name="addc", type="Add", input_ports=[0, 1],
                output_ports=[2], port_dims={2: [1, 3, 16, 1]}),
        IRLayer(id=5, name="act", type="ReLU", input_ports=[0],
                output_ports=[1], port_dims={1: [1, 3, 16, 1]}),
        _const(6, "tgt2", np.asarray([1, 48], np.int64)),
        IRLayer(id=7, name="flat", type="Reshape",
                attrs={"special_zero": "true"},
                input_ports=[0, 1], output_ports=[2],
                port_dims={2: [1, 48]}),
        IRLayer(id=8, name="out", type="Result", input_ports=[0]),
    ]
    edges = {(2, 0): (0, 0), (2, 1): (1, 0), (4, 0): (2, 2), (4, 1): (3, 0),
             (5, 0): (4, 2), (7, 0): (5, 1), (7, 1): (6, 0), (8, 0): (7, 2)}
    xml, blob = write_ir_graph(layers, edges)
    net = OVGraphNet(parse_ir_graph(xml, blob))
    x = rng.randn(1, 4, 4, 3).astype(np.float32)  # caller hands NHWC
    out = net.apply(net.init_variables(), jnp.asarray(x))
    y = np.asarray(out[net.outputs[0]])
    x_nchw = np.transpose(x, (0, 3, 1, 2))
    expect = np.maximum(x_nchw.reshape(1, 3, 16, 1) + bias, 0).reshape(1, 48)
    assert y.shape == (1, 48)
    np.testing.assert_allclose(y, expect, rtol=1e-6, atol=1e-6)
