"""Numerical parity tests for geometry kernels vs cv2/numpy references.

These mirror the reference's semantics at modules/utils/image.py — the
cross-framework parity gate for the preprocessing chain.
"""
import cv2
import numpy as np
import pytest

from face_detection_and_recognition_tpu.ops import boxes as B
from face_detection_and_recognition_tpu.ops import geometry as G
from face_detection_and_recognition_tpu.ops import preprocess as P


def ref_pad_resize(img, new_size, color=(125, 125, 125)):
    """Independent numpy/cv2 reimplementation of the reference letterbox."""
    in_h, in_w = img.shape[:2]
    new_w, new_h = new_size
    scale = min(new_w / in_w, new_h / in_h)
    sw, sh = int(in_w * scale), int(in_h * scale)
    resized = cv2.resize(img, (sw, sh))
    d_w, d_h = max(new_w - sw, 0), max(new_h - sh, 0)
    top, bottom = d_h // 2, d_h - d_h // 2
    left, right = d_w // 2, d_w - d_w // 2
    return cv2.copyMakeBorder(
        resized, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color
    )


@pytest.mark.parametrize(
    "in_hw,out_wh",
    [((576, 1024), (640, 640)), ((480, 640), (300, 300)), ((720, 405), (256, 256)),
     ((100, 100), (128, 128))],
)
def test_pad_resize_matches_cv2(rng, in_hw, out_wh):
    img = rng.randint(0, 255, (*in_hw, 3)).astype(np.uint8)
    ref = ref_pad_resize(img, out_wh).astype(np.float32)
    got = np.asarray(G.pad_resize_image(img, out_wh))
    assert got.shape == ref.shape
    # bilinear rounding differences between cv2's fixed-point and XLA's float
    # path stay within ~1 intensity level
    assert np.abs(got - ref).max() <= 1.0 + 1e-4
    # padded border must be exact
    assert np.abs(got[0, 0] - ref[0, 0]).max() == 0


def test_scale_coords_matches_reference():
    # boxes detected on a 640x640 letterboxed view of a 576x1024 image
    model_hw, orig_hw = (640, 640), (576, 1024)
    coords = np.array(
        [[100.0, 200.0, 300.0, 400.0], [0.0, 0.0, 640.0, 640.0]], np.float32
    )

    # reference math (modules/utils/image.py:79-99)
    gain = min(model_hw[0] / orig_hw[0], model_hw[1] / orig_hw[1])
    pad = ((model_hw[1] - orig_hw[1] * gain) / 2, (model_hw[0] - orig_hw[0] * gain) / 2)
    ref = coords.copy()
    ref[:, [0, 2]] -= pad[0]
    ref[:, [1, 3]] -= pad[1]
    ref /= gain
    ref[:, [0, 2]] = ref[:, [0, 2]].clip(0, orig_hw[1])
    ref[:, [1, 3]] = ref[:, [1, 3]].clip(0, orig_hw[0])

    got = np.asarray(G.scale_coords(model_hw, coords, orig_hw))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_scale_coords_with_landmarks():
    model_hw, orig_hw = (640, 640), (480, 640)
    rng0 = np.random.RandomState(0)
    coords = rng0.uniform(0, 640, (5, 14)).astype(np.float32)
    got = np.asarray(G.scale_coords(model_hw, coords, orig_hw))
    # reference clip_coords touches ONLY the 4 box columns (image.py:62-76);
    # landmark columns pass through unclipped
    assert got[:, [0, 2]].max() <= orig_hw[1]
    assert got[:, [1, 3]].max() <= orig_hw[0]
    gain = min(model_hw[0] / orig_hw[0], model_hw[1] / orig_hw[1])
    pad = ((model_hw[1] - orig_hw[1] * gain) / 2,
           (model_hw[0] - orig_hw[0] * gain) / 2)
    ref_lmk_x = (coords[:, 4::2] - pad[0]) / gain
    np.testing.assert_allclose(got[:, 4::2], ref_lmk_x, atol=1e-3)


def test_standardize_image_matches_reference(rng):
    img = rng.randint(0, 255, (160, 160, 3)).astype(np.float32)
    mean, std = img.mean(), img.std()
    std_adj = max(std, 1.0 / np.sqrt(img.size))
    ref = (img - mean) / std_adj
    got = np.asarray(G.standardize_image(img))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # batched path
    got_b = np.asarray(G.standardize_image(img[None]))
    np.testing.assert_allclose(got_b[0], ref, rtol=1e-5, atol=1e-5)


def test_iou_matrix_matches_scalar_reference(rng):
    def ref_iou(b1, b2):
        xd = min(b1[2], b2[2]) - max(b1[0], b2[0])
        yd = min(b1[3], b2[3]) - max(b1[1], b2[1])
        if xd < 0 or yd < 0:
            return 0.0
        inter = xd * yd
        return inter / (
            (b1[2] - b1[0]) * (b1[3] - b1[1]) + (b2[2] - b2[0]) * (b2[3] - b2[1]) - inter
        )

    bxs = rng.uniform(0, 100, (8, 2, 2))
    bxs = np.concatenate([bxs.min(1), bxs.max(1)], axis=-1).astype(np.float32)
    got = np.asarray(B.iou_matrix(bxs, bxs))
    for i in range(8):
        for j in range(8):
            assert abs(got[i, j] - ref_iou(bxs[i], bxs[j])) < 1e-5


def test_iou_plus1_convention():
    # identical boxes => iou 1 under both conventions
    b = np.array([[0.0, 0.0, 10.0, 10.0]], np.float32)
    assert abs(float(B.iou_matrix(b, b, plus1=True, eps=1e-16)[0, 0]) - 1.0) < 1e-5
    # +1 convention counts single-pixel boxes as area 1, not 0
    p = np.array([[5.0, 5.0, 5.0, 5.0]], np.float32)
    assert float(B.iou_matrix(p, p, plus1=True, eps=1e-16)[0, 0]) > 0.99


def test_box_conversions_roundtrip(rng):
    xyxy = rng.uniform(0, 100, (16, 4)).astype(np.float32)
    xyxy[:, 2:] += xyxy[:, :2]
    back = np.asarray(B.xywh2xyxy(B.xyxy2xywh(xyxy)))
    np.testing.assert_allclose(back, xyxy, atol=1e-4)


def test_preprocess_yolov5_spec(rng):
    img = rng.randint(0, 255, (576, 1024, 3)).astype(np.uint8)
    out = np.asarray(P.apply_preprocess(img, P.YOLOV5_FACE))
    assert out.shape == (640, 640, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
    # reference: BGR->RGB then /255 on the letterboxed image
    ref = ref_pad_resize(img[..., ::-1], (640, 640)).astype(np.float32) / 255.0
    assert np.abs(out - ref).max() <= (1.0 / 255) + 1e-5


def test_preprocess_blazeface_range(rng):
    img = rng.randint(0, 255, (256, 256, 3)).astype(np.uint8)
    out = np.asarray(P.apply_preprocess(img, P.BLAZEFACE_BACK))
    assert out.shape == (256, 256, 3)
    assert -1.0 - 1e-5 <= out.min() and out.max() <= 1.0 + 1e-5


@pytest.mark.slow
def test_letterbox_strategies_match_staged_reference(rng):
    """apply_preprocess picks pad-through-matrix (+ fused where fill) or
    staged resize+canvas by pad fraction; BOTH must match the plain
    resize -> normalize -> dynamic_update_slice composition exactly
    (zero resample taps contribute exact 0.0, so the interior is bitwise
    identical and the fill constant is shared)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    def staged(img, spec, dt):
        w, h = spec.size
        ih, iw = img.shape[:2]
        _, sh, sw, top, left = G.letterbox_params((ih, iw), (h, w))
        x = G.resize_bilinear(img.astype(dt), (sh, sw), dtype=dt)
        if spec.bgr_to_rgb:
            x = x[..., ::-1]
        x = (x - jnp.asarray(spec.mean, dt)) * jnp.asarray(spec.scale, dt)
        fill = jnp.asarray(spec.fill, dt)
        if spec.bgr_to_rgb:
            fill = fill[::-1]
        ft = (fill - jnp.asarray(spec.mean, dt)) * jnp.asarray(spec.scale, dt)
        canvas = jnp.broadcast_to(ft, (h, w, 3))
        return jax.lax.dynamic_update_slice(canvas, x, (top, left, 0))

    cases = [
        # rect canvas: 6% pad rows -> pad-through-matrix branch
        (dataclasses.replace(P.YOLOV5_FACE, size=(640, 384)), (576, 1024)),
        # square canvas on wide video: 44% pad rows -> staged branch
        (P.YOLOV5_FACE, (576, 1024)),
        # portrait source: column pads
        (P.YOLOV5_FACE, (700, 500)),
        (P.OPENCV_SSD, (480, 640)),
    ]
    for spec, in_hw in cases:
        img = rng.randint(0, 256, (*in_hw, 3)).astype(np.uint8)
        for dt in (jnp.float32, jnp.bfloat16):
            a = np.asarray(staged(jnp.asarray(img), spec, dt), np.float32)
            b = np.asarray(P.apply_preprocess(jnp.asarray(img), spec, dt),
                           np.float32)
            atol = 0.005 * 255 * abs(spec.scale) if dt == jnp.bfloat16 \
                else 1e-5
            np.testing.assert_allclose(b, a, atol=atol)


def test_banded_resize_matches_jax_image_resize(rng):
    """resize_bilinear's banded row-block GEMMs are weight-identical to
    jax.image.resize (downscale crosses block windows; upscale and the
    no-op axis take the dense/shortcut paths)."""
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.ops.geometry import \
        resize_bilinear

    for (h, w), (oh, ow) in [((576, 320), (360, 200)), ((230, 310), (161, 217)),
                             ((64, 48), (160, 120)), ((300, 256), (300, 160))]:
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        a = np.asarray(resize_bilinear(jnp.asarray(img), (oh, ow), jnp.float32))
        b = np.asarray(jax.image.resize(
            jnp.asarray(img).astype(jnp.float32), (oh, ow, 3), "linear",
            antialias=False))
        # identical weights; only f32 contraction order differs between the
        # banded blocks and the dense dot (~1e-4 relative on 0..255 pixels)
        np.testing.assert_allclose(a, b, atol=5e-2)


def test_rect_letterbox_size():
    from face_detection_and_recognition_tpu.ops.geometry import (
        letterbox_params, rect_letterbox_size)

    # the reference bench condition: 576x1024 -> 384x640 at stride 32
    assert rect_letterbox_size((576, 1024), (640, 640), 32) == (640, 384)
    # square input stays the full box
    assert rect_letterbox_size((640, 640), (640, 640), 32) == (640, 640)
    assert rect_letterbox_size((96, 128), (640, 640), 32) == (640, 480)
    # P6 stride
    assert rect_letterbox_size((576, 1024), (640, 640), 64) == (640, 384)
    # rect canvas letterboxes at the SAME scale as the square box, so the
    # resized interior is identical — only the padding shrinks
    for hw in ((576, 1024), (480, 640), (720, 1280), (333, 517)):
        tw, th = rect_letterbox_size(hw, (640, 640), 32)
        s_sq = letterbox_params(hw, (640, 640))[0]
        s_rc, new_h, new_w, top, left = letterbox_params(hw, (th, tw))
        assert s_rc == s_sq, (hw, s_rc, s_sq)
        assert new_h <= th and new_w <= tw
