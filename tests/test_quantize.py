"""int8 PTQ: folded-quantized ConvBN matches f32 within quant error, and a
full quantized yolov5n produces decode maps close to the f32 graph."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_detection_and_recognition_tpu.models.layers import ConvBN
from face_detection_and_recognition_tpu.utils.quantize import quantize_variables

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)


def test_convbn_quantized_matches_f32(rng):
    m = ConvBN(32, 3, 2)
    x = rng.uniform(-1, 1, (2, 16, 16, 16)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats
    v = jax.tree_util.tree_map(np.asarray, v)
    v["batch_stats"]["BatchNorm_0"]["mean"] = rng.uniform(-0.2, 0.2, 32).astype(np.float32)
    v["batch_stats"]["BatchNorm_0"]["var"] = rng.uniform(0.5, 2.0, 32).astype(np.float32)
    v["params"]["BatchNorm_0"]["scale"] = rng.uniform(0.5, 1.5, 32).astype(np.float32)
    ref = np.asarray(m.apply(v, x))

    vq = quantize_variables(v)
    mq = ConvBN(32, 3, 2, quantized=True)
    got = np.asarray(mq.apply(vq, x))
    # int8 quantization error: relative to activation scale
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.05
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.999


def test_yolov5n_quantized_graph(rng):
    from face_detection_and_recognition_tpu.models.yolov5_face import (
        YoloV5FaceConfig, make_yolov5_face)

    cfg = YoloV5FaceConfig(arch="yolov5n", input_size=(128, 128),
                           max_candidates=128, max_det=16)
    net, variables, detect = make_yolov5_face(cfg)
    x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    maps_f32 = jax.jit(net.apply)(variables, x)

    vq = quantize_variables(jax.tree_util.tree_map(np.asarray, variables))
    netq, _, detectq = make_yolov5_face(cfg, quantized=True)
    # quantized tree structure matches the quantized net's init tree
    init_q = jax.jit(netq.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 128, 3)))
    import jax.tree_util as jtu

    conv = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(vq)}
    init = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(init_q)}
    assert conv == init

    maps_q = jax.jit(netq.apply)(vq, x)
    for mf, mq_ in zip(maps_f32, maps_q):
        mf, mq_ = np.asarray(mf), np.asarray(mq_)
        # per-tensor dynamic activation quant: high correlation expected
        assert np.corrcoef(mf.ravel(), mq_.ravel())[0, 1] > 0.98
    # detect pipeline runs end to end on the quantized graph
    dets, valid = detectq(vq, x)
    assert np.asarray(dets).shape == (1, 16, 16)


def test_static_calibrated_quantization(rng):
    """quantized="static": calibrated ascale replaces the dynamic absmax
    pass; outputs match the dynamic-quantized graph closely when the eval
    batch matches the calibration range."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.layers import ConvBN
    from face_detection_and_recognition_tpu.utils.quantize import (
        calibrate_activation_scales, pour_activation_scales)

    x = rng.uniform(-1, 1, (2, 16, 16, 8)).astype(np.float32)
    m = ConvBN(32, 3, 2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = m.apply(v, jnp.asarray(x))

    vq = quantize_variables(jax.tree_util.tree_map(np.asarray, v))
    scales = calibrate_activation_scales(m, v, [jnp.asarray(x)])
    assert scales, "interceptor captured no ConvBN inputs"
    vqs = pour_activation_scales(vq, scales)
    ms = ConvBN(32, 3, 2, quantized="static")
    out_static = ms.apply(vqs, jnp.asarray(x))
    md = ConvBN(32, 3, 2, quantized=True)
    out_dyn = md.apply(vq, jnp.asarray(x))
    # calibration batch == eval batch -> identical scale -> identical output
    np.testing.assert_allclose(np.asarray(out_static), np.asarray(out_dyn),
                               atol=1e-5)
    # and both stay near f32 within quantization error
    err = np.abs(np.asarray(out_static) - np.asarray(ref)).max()
    assert err < 0.1


def test_yolov5n_static_quantized_graph(rng):
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.yolov5_face import (
        YoloV5FaceConfig, make_yolov5_face)
    from face_detection_and_recognition_tpu.utils.quantize import (
        calibrate_activation_scales, pour_activation_scales)

    cfg = YoloV5FaceConfig(arch="yolov5n-0.5", input_size=(64, 64))
    net, variables, detect = make_yolov5_face(cfg)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    vq = quantize_variables(jax.tree_util.tree_map(np.asarray, variables))
    scales = calibrate_activation_scales(net, variables, [jnp.asarray(x)])
    vqs = pour_activation_scales(vq, scales)
    netq, initq, detectq = make_yolov5_face(cfg, quantized="static")
    # static tree matches the static net's init structure
    a = jax.tree_util.tree_structure(initq["params"])
    b = jax.tree_util.tree_structure(vqs["params"])
    assert a == b
    dets, valid = detectq(vqs, jnp.asarray(x))
    assert np.isfinite(np.asarray(dets)).all()
