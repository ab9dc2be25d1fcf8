"""Fused ensemble program == staged per-stage path, to f32 tolerance.

The fused program (engine._ensemble_for) must reproduce exactly what the
separate detect -> crop -> embed -> age/gender dispatches produce; the only
difference allowed is WHERE the work runs (one XLA program vs many), never
WHAT it computes. This is the guarantee the reference's Triton ensemble
never had a test for (SURVEY.md §4 "Not tested: Triton servers").
"""
import jax
import numpy as np
import pytest

from face_detection_and_recognition_tpu.core.engine import EngineConfig, FaceEngine

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)


@pytest.fixture(scope="module")
def engine():
    return FaceEngine(EngineConfig(
        detector="blazeface-front", det_thres=0.0, bbox_area_thres=0.0,
        max_det=8, embedder="mobile_facenet", with_age_gender=True,
    ))


@pytest.fixture(scope="module")
def img(rng):
    return rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)


def test_masked_chunked_net_matches_dense():
    """The validity-sorted chunk-skip wrapper == dense-fn + zero-mask for
    every validity pattern (none / sparse / clustered / all), any chunk
    remainder, and tuple-valued fns."""
    import jax
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.core.engine import FaceEngine

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(12, 5).astype(np.float32))

    def fn(x):  # [C, 12] -> ([C, 5], [C, 2])
        h = jnp.tanh(x @ w)
        return h, h[:, :2] * 2.0

    for n, pattern in [(7, "none"), (40, "sparse"), (40, "clustered"),
                       (96, "all"), (129, "sparse")]:
        xs = jnp.asarray(rng.randn(n, 12).astype(np.float32))
        if pattern == "none":
            valid = np.zeros(n, bool)
        elif pattern == "all":
            valid = np.ones(n, bool)
        elif pattern == "clustered":
            valid = np.zeros(n, bool)
            valid[5:9] = True
        else:
            valid = rng.rand(n) < 0.2
        valid_j = jnp.asarray(valid)
        got = jax.jit(lambda x, v: FaceEngine._masked_chunked_net(
            fn, x, v, chunk=16))(xs, valid_j)
        a, b = fn(xs)
        ref = (jnp.where(valid_j[:, None], a, 0.0),
               jnp.where(valid_j[:, None], b, 0.0))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                                   atol=1e-6)


def test_fused_matches_staged_detection(engine, img):
    res = engine.detect_embed_classify_batch(img[None])
    post_fused = res.det.to_numpy()[0]
    post_staged = engine.detect_image(img)
    np.testing.assert_allclose(post_fused.boxes, post_staged.boxes)
    np.testing.assert_allclose(post_fused.bbox_confs, post_staged.bbox_confs)


def test_fused_matches_staged_embeddings(engine, img):
    res = engine.detect_embed_classify_batch(img[None])
    m = np.asarray(res.det.valid[0])
    post = engine.detect_image(img)
    if not len(post.boxes):
        pytest.skip("no detections from random init")
    staged = engine.embed_faces(img, post.boxes)
    fused = np.asarray(res.embeddings[0])[m]
    np.testing.assert_allclose(fused, staged, atol=1e-4, rtol=1e-4)
    # invalid rows are zeroed, not garbage
    assert np.all(np.asarray(res.embeddings[0])[~m] == 0.0)


def test_fused_matches_staged_age_gender(engine, img):
    res = engine.detect_embed_classify_batch(img[None])
    m = np.asarray(res.det.valid[0])
    if not m.any():
        pytest.skip("no detections from random init")
    post = engine.detect_age_gender(img)
    from face_detection_and_recognition_tpu.models.age_gender import (
        labels_from_probs,
    )

    fused_labels = list(labels_from_probs(
        np.asarray(res.age_probs[0])[m], np.asarray(res.gender_probs[0])[m]
    ))
    assert fused_labels == post.bbox_labels


def test_fused_crops_are_raw_pixels(engine, img):
    res = engine.detect_embed_classify_batch(img[None], crop_size=(112, 112))
    crops = np.asarray(res.crops[0])
    assert crops.shape[1:] == (112, 112, 3)
    assert crops.min() >= 0.0 and crops.max() <= 255.0


def test_fused_batch_consistency(engine, rng):
    """A 2-image batch gives the same per-image results as two 1-image calls."""
    imgs = rng.randint(0, 255, (2, 96, 128, 3)).astype(np.uint8)
    both = engine.detect_embed_classify_batch(imgs)
    for i in range(2):
        one = engine.detect_embed_classify_batch(imgs[i][None])
        np.testing.assert_allclose(np.asarray(both.det.boxes[i]),
                                   np.asarray(one.det.boxes[0]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(both.embeddings[i]),
                                   np.asarray(one.embeddings[0]),
                                   atol=1e-4, rtol=1e-4)


def test_native_detector_raises(rng):
    eng = FaceEngine(EngineConfig(detector="mtcnn", max_det=8))
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    with pytest.raises(NotImplementedError):
        eng.detect_embed_classify_batch(img[None])


def test_fused_ensemble_rect_mode_matches_square(rng):
    """rect=True through the FUSED ensemble: boxes/crops land in original
    pixels either way; the rect program only shrinks the letterbox canvas."""
    frames = rng.randint(0, 255, (2, 96, 128, 3)).astype(np.uint8)
    sq = FaceEngine(EngineConfig(detector="yolov5n", det_thres=0.01,
                                 max_det=4, embedder="mobile_facenet"))
    rc = FaceEngine(EngineConfig(detector="yolov5n", det_thres=0.01,
                                 max_det=4, embedder="mobile_facenet",
                                 rect=True))
    rc.variables = sq.variables
    rc.embed_vars = sq.embed_vars
    a = sq.detect_embed_classify_batch(frames)
    b = rc.detect_embed_classify_batch(frames)
    # same output contract (shapes + dtypes) regardless of canvas
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        assert np.asarray(x).shape == np.asarray(y).shape
        assert np.asarray(x).dtype == np.asarray(y).dtype

