"""The caffe-graph-interpreter training path (train/caffe_golden.py).

The interpreter (models/caffe_ssd.py) is pure jnp, so the EXACT public
res10_300x300 deploy graph trains directly; these tests pin the step's
conventions (BN statistics frozen, kernels moving) and the full
trained-blobs -> REAL binary .caffemodel -> engine pour / file-embedded-
graph execution round trip that makes the importer fire on a real
artifact (reference modules/opencv2_dnn/model.py:21).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_detection_and_recognition_tpu.train.caffe_golden import (

    CaffeGoldenConfig, create_res10_train_state, export_trained_caffemodel,
    make_res10_train_step_ema)

pytestmark = pytest.mark.golden  # golden lane (pyproject addopts)


@pytest.fixture(scope="module")
def trained_two_steps():
    cfg = CaffeGoldenConfig(max_targets=8, lr=0.01, warmup_steps=1,
                            total_steps=10)
    state = create_res10_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_res10_train_step_ema(state))
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (2, 300, 300, 3)).astype(np.uint8)
    targets = np.zeros((2, 8, 14), np.float32)
    targets[:, 0, :4] = [150.0, 150.0, 60.0, 80.0]   # cxcywh pixels
    valid = np.zeros((2, 8), bool)
    valid[:, 0] = True
    n = jnp.zeros((), jnp.int32)
    p, bs, opt, ema, n, loss1, metrics = step(
        state["params"], state["batch_stats"], state["opt_state"],
        state["ema_params"], n, imgs, targets, valid)
    p, bs, opt, ema, n, loss2, _ = step(p, bs, opt, ema, n, imgs, targets,
                                        valid)
    return state, p, (float(loss1), float(loss2)), metrics


def test_step_trains_kernels_and_freezes_bn_statistics(trained_two_steps):
    state, p, (loss1, loss2), metrics = trained_two_steps
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert float(metrics["box"]) > 0 and float(metrics["obj"]) > 0
    net = state["net"]
    # every BatchNorm statistic blob must be bit-identical to its init
    for name in state["bn_names"]:
        for a, b in zip(state["params"][name], p[name]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # while conv kernels moved (warmup step 0 has lr=0; step 1 does not)
    conv = [s.name for s in net.steps
            if s.op == "conv" and s.name in p][0]
    assert float(jnp.abs(p[conv][0] - state["params"][conv][0]).max()) > 0


def test_trained_blobs_round_trip_through_a_real_caffemodel(
        trained_two_steps, tmp_path):
    state, p, _, _ = trained_two_steps
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.models.res10 import (
        build_res10_from_caffemodel)

    cm = str(tmp_path / "trained_res10.caffemodel")
    export_trained_caffemodel({"params": p}, cm)

    # entry path 1: the strict name/shape blob pour (engine.load_weights)
    eng = FaceEngine(EngineConfig(detector="res10-ssd", det_thres=0.5))
    eng.load_weights(cm)
    for name, blobs in p.items():
        for a, b in zip(blobs, eng.variables[name]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=0, rtol=0)

    # entry path 2: execute the FILE's own embedded graph; outputs must be
    # identical to the deploy-table program on the same input
    net2, w2, det2 = build_res10_from_caffemodel(cm, strict_table=False)
    x = jnp.asarray(
        np.random.RandomState(1).randint(0, 255, (1, 300, 300, 3))
        .astype(np.float32) - np.array([104.0, 117.0, 123.0], np.float32))
    rows1, valid1 = eng._detect(eng.variables, x)
    rows2, valid2 = det2(w2, x)
    np.testing.assert_allclose(np.asarray(rows1), np.asarray(rows2),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(valid1), np.asarray(valid2))


def test_detect_accepts_params_wrapped_weights(trained_two_steps):
    """engine pipelines hand detect() the raw blob dict; the trainer and
    orbax reload hand it {'params': blobs} — both must run identically."""
    state, p, _, _ = trained_two_steps
    from face_detection_and_recognition_tpu.models.caffe_ssd import (
        make_caffe_ssd_detect)

    det = make_caffe_ssd_detect(state["net"])
    x = jnp.asarray(
        np.random.RandomState(2).randint(0, 255, (1, 300, 300, 3))
        .astype(np.float32) - 117.0)
    r1, v1 = det(p, x)
    r2, v2 = det({"params": p}, x)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
