"""MTCNN cascade: net shapes, pyramid math, box utilities, and a full
structural run of the 3-stage jitted pipeline."""
import numpy as np
import pytest

from face_detection_and_recognition_tpu.models import mtcnn as M


def test_pyramid_scales_matches_reference_config():
    # 576x1024 video frame, min_size 40, factor 0.7 (model.py:57-68)
    scales = M.pyramid_scales(576, 1024, 40, 0.7)
    assert scales[0] == pytest.approx(12 / 40)
    # every level keeps short side >= 12
    for s in scales:
        assert 576 * s >= 12
    # next level would drop below 12
    assert 576 * scales[-1] * 0.7 < 12


def test_net_output_shapes():
    import jax
    import jax.numpy as jnp

    cascade = M.MTCNN()
    v = cascade.variables()
    prob, reg = cascade.pnet.apply(v["pnet"], jnp.zeros((1, 100, 80, 3)))
    # fully conv: out = floor((in-2)/2 ceil) pattern -> (100-2)/2=49 -> 45
    assert prob.shape[-1] == 2 and reg.shape[-1] == 4
    assert prob.shape[1:3] == reg.shape[1:3]
    p2, r2 = cascade.rnet.apply(v["rnet"], jnp.zeros((3, 24, 24, 3)))
    assert p2.shape == (3, 2) and r2.shape == (3, 4)
    p3, r3, l3 = cascade.onet.apply(v["onet"], jnp.zeros((3, 48, 48, 3)))
    assert p3.shape == (3, 2) and r3.shape == (3, 4) and l3.shape == (3, 10)
    np.testing.assert_allclose(np.asarray(p3).sum(-1), 1.0, atol=1e-6)


def test_rerec_squares_boxes():
    boxes = np.array([[0.0, 0.0, 10.0, 20.0]], np.float32)
    sq = np.asarray(M._rerec(boxes))[0]
    assert sq[2] - sq[0] == pytest.approx(20.0)
    assert sq[3] - sq[1] == pytest.approx(20.0)
    # center preserved
    assert (sq[0] + sq[2]) / 2 == pytest.approx(5.0)


def test_bbreg_plus1_convention():
    boxes = np.array([[10.0, 10.0, 19.0, 19.0]], np.float32)  # w=h=10 (+1)
    reg = np.array([[0.1, 0.2, -0.1, -0.2]], np.float32)
    out = np.asarray(M._bbreg(boxes, reg))[0]
    np.testing.assert_allclose(out, [11.0, 12.0, 18.0, 17.0])


def test_full_cascade_runs_and_masks(rng):
    cascade = M.MTCNN(M.MTCNNConfig(max_per_level=32, max_stage1=64,
                                    max_stage2=32, max_faces=8))
    img = rng.randint(0, 255, (144, 176, 3)).astype(np.uint8)
    dets, valid = cascade(cascade.variables(), img)
    dets, valid = np.asarray(dets), np.asarray(valid)
    assert dets.shape == (8, 15)
    assert valid.shape == (8,)
    # outputs normalized; all valid rows exceed the O-Net threshold
    if valid.any():
        assert (dets[valid][:, -1] > 0.8).all()
        assert dets[valid][:, :4].max() <= 1.5  # normalized-ish range


def test_crop_and_resize_padded_zero_oob(rng):
    from face_detection_and_recognition_tpu.ops.crop import \
        crop_and_resize_padded

    img = np.full((32, 32, 3), 200, np.uint8)
    # box half outside the image: left half of the crop must be zeros
    boxes = np.array([[-16.0, 0.0, 16.0, 32.0]], np.float32)
    crops = np.asarray(crop_and_resize_padded(img, boxes, (16, 16)))
    assert (crops[0, :, :7] == 0).all()
    assert (crops[0, :, 9:] > 150).all()


def test_crop_gemm_matches_gather(rng):
    """The MXU (gemm) crop path must equal the gather path bit-for-bit-ish
    on both clamp and zero-pad semantics (TPU uses gemm, CPU tests gather)."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.ops.crop import (
        crop_and_resize, crop_and_resize_padded,
    )

    img = rng.randint(0, 255, (57, 43, 3)).astype(np.uint8)
    boxes = np.stack([
        rng.uniform(-10, 30, 8), rng.uniform(-10, 40, 8),
        rng.uniform(5, 60, 8), rng.uniform(5, 75, 8),
    ], axis=-1).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2]) + 2
    valid = np.ones(8, bool)
    valid[-1] = False

    for fn in (crop_and_resize, crop_and_resize_padded):
        a = np.asarray(fn(jnp.asarray(img), jnp.asarray(boxes), (12, 9),
                          jnp.asarray(valid), method="gather"))
        b = np.asarray(fn(jnp.asarray(img), jnp.asarray(boxes), (12, 9),
                          jnp.asarray(valid), method="gemm"))
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-5)
        assert (b[-1] == 0).all()


def test_crop_pallas_matches_gather(rng):
    """The Pallas crop kernel (interpret mode on CPU) matches the gather
    reference on both semantics."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.ops.crop import (
        crop_and_resize, crop_and_resize_padded,
    )

    img = (rng.uniform(-1, 1, (57, 43, 3))).astype(np.float32)  # norm range
    boxes = np.stack([
        rng.uniform(-10, 30, 8), rng.uniform(-10, 40, 8),
        rng.uniform(5, 60, 8), rng.uniform(5, 75, 8),
    ], axis=-1).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2]) + 2
    valid = np.ones(8, bool)
    valid[-1] = False
    for fn in (crop_and_resize, crop_and_resize_padded):
        a = np.asarray(fn(jnp.asarray(img), jnp.asarray(boxes), (12, 9),
                          jnp.asarray(valid), method="gather"))
        b = np.asarray(fn(jnp.asarray(img), jnp.asarray(boxes), (12, 9),
                          jnp.asarray(valid), method="pallas"))
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-4)
        assert (b[-1] == 0).all()


def test_full_cascade_bf16_compute(rng):
    """The bf16 cascade (pyramid resampled in the compute dtype, bf16 crop
    GEMMs) runs off-TPU and produces outputs close to the f32 cascade."""
    import jax.numpy as jnp

    cfg = M.MTCNNConfig(max_per_level=32, max_stage1=64, max_stage2=32,
                        max_faces=8)
    img = rng.randint(0, 255, (144, 176, 3)).astype(np.uint8)
    f32 = M.MTCNN(cfg)
    b16 = M.MTCNN(cfg, dtype=jnp.bfloat16)
    d32, v32 = f32(f32.variables(), img)
    d16, v16 = b16(b16.variables(), img)
    assert np.asarray(d16).shape == (8, 15)
    assert np.asarray(d16).dtype == np.float32  # outputs stay f32
    # same random init; detections agree on the confidently-valid rows
    both = np.asarray(v32) & np.asarray(v16)
    if both.any():
        np.testing.assert_allclose(np.asarray(d32)[both, :4],
                                   np.asarray(d16)[both, :4], atol=0.05)
