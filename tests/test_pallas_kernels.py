"""Pallas kernels in interpreter mode: exactness vs the jnp implementations."""
import numpy as np
import pytest

from face_detection_and_recognition_tpu.ops import nms as N
from face_detection_and_recognition_tpu.ops.pallas_kernels import (
    nms_fixpoint_pallas, topk_gallery_pallas)
from tests.test_nms import random_boxes, ref_greedy_nms


@pytest.mark.parametrize("plus1,strict,mode", [
    (False, True, "union"),
    (True, False, "union"),
    (True, False, "min"),
])
def test_nms_pallas_matches_loop_reference(rng, plus1, strict, mode):
    n = 64
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sboxes, svalid = boxes[order], np.ones(n, bool)
    keep_sorted = np.asarray(
        nms_fixpoint_pallas(sboxes, svalid, 0.4, plus1=plus1, strict=strict,
                            mode=mode, interpret=True)
    )
    kept_orig = sorted(order[np.nonzero(keep_sorted)[0]].tolist())
    ref = sorted(ref_greedy_nms(boxes, scores, 0.4, plus1=plus1,
                                strict=strict, mode=mode))
    assert kept_orig == ref


def test_nms_pallas_validity_mask(rng):
    boxes = random_boxes(rng, 16)
    valid = np.zeros(16, bool)
    valid[:3] = True
    keep = np.asarray(nms_fixpoint_pallas(boxes, valid, 0.5, interpret=True))
    assert not keep[3:].any()


def test_topk_gallery_matches_dense(rng):
    n, d, m, k = 8, 32, 1024, 8
    q = rng.normal(0, 1, (n, d)).astype(np.float32)
    g = rng.normal(0, 1, (m, d)).astype(np.float32)
    scores, idx = topk_gallery_pallas(q, g, k=k, block_m=256, interpret=True)
    scores, idx = np.asarray(scores), np.asarray(idx)
    dense = q @ g.T
    ref_idx = np.argsort(-dense, axis=1)[:, :k]
    ref_scores = np.take_along_axis(dense, ref_idx, axis=1)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-4)
    # indices may tie-swap; compare the score sets strictly, indices by score
    for i in range(n):
        np.testing.assert_allclose(dense[i, idx[i]], ref_scores[i],
                                   rtol=1e-4, atol=1e-4)


def test_topk_gallery_single_block(rng):
    q = rng.normal(0, 1, (4, 16)).astype(np.float32)
    g = rng.normal(0, 1, (128, 16)).astype(np.float32)
    scores, idx = topk_gallery_pallas(q, g, k=4, block_m=128, interpret=True)
    dense = q @ g.T
    ref = np.sort(dense, axis=1)[:, ::-1][:, :4]
    np.testing.assert_allclose(np.asarray(scores), ref, rtol=1e-4, atol=1e-4)


def test_topk_gallery_nonmultiple_and_negative_scores(rng):
    # gallery not a block multiple; all similarities negative — pad rows
    # (score 0) must NOT displace real negative-score matches
    q = np.ones((2, 8), np.float32)
    g = -np.abs(rng.normal(1, 0.2, (100, 8))).astype(np.float32)
    from face_detection_and_recognition_tpu.ops.pallas_kernels import \
        topk_gallery_pallas

    scores, idx = topk_gallery_pallas(q, g, k=4, block_m=64, interpret=True)
    scores, idx = np.asarray(scores), np.asarray(idx)
    assert (idx < 100).all()
    assert (scores < 0).all()
    dense = q @ g.T
    ref = np.sort(dense, axis=1)[:, ::-1][:, :4]
    np.testing.assert_allclose(scores, ref, rtol=1e-4, atol=1e-5)


def test_crop_windowed_matches_dense(rng):
    """The windowed crop kernel is bit-exact vs the dense kernel on an
    image large enough to take the windowed path (window-crossing, huge,
    edge-touching and fully-outside boxes included)."""
    import jax.numpy as jnp

    import face_detection_and_recognition_tpu.ops.pallas_kernels as PK

    img = rng.uniform(-1, 1, (256, 256, 3)).astype(np.float32)
    img_cm = jnp.asarray(img).transpose(2, 0, 1).reshape(-1, img.shape[1])
    boxes = jnp.asarray(np.array([
        [10, 10, 50, 60],          # inside one window
        [100, 100, 260, 280],      # crosses window boundaries + image edge
        [-30, -40, 300, 300],      # covers everything incl. outside
        [120, 120, 140, 150],
        [-50, -50, -10, -5],       # fully outside
        [0, 190, 256, 256],        # bottom edge
    ], np.float32))
    valid = jnp.asarray(np.array([1, 1, 1, 1, 1, 0], np.float32))

    for clamp in (True, False):
        win = np.asarray(PK.crop_gemm_pallas.__wrapped__(
            img_cm, boxes, valid, (24, 24), clamp, True))
        orig = PK._CROP_WIN_H
        try:
            PK._CROP_WIN_H = 10 ** 6          # force the dense kernel
            dense = np.asarray(PK.crop_gemm_pallas.__wrapped__(
                img_cm, boxes, valid, (24, 24), clamp, True))
        finally:
            PK._CROP_WIN_H = orig
        # identical hat weights; only f32 summation GROUPING differs when a
        # 2-tap support straddles a piece boundary
        np.testing.assert_allclose(win, dense, atol=1e-6)
        assert (win[-1] == 0).all()


def test_candidate_rows_gather_matches_take_along(rng):
    """The streaming one-hot GEMM gather returns exactly
    take_along_axis(concat(levels), idx) — partial tail blocks, level
    boundaries and repeated indices included."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.ops.pallas_kernels import \
        candidate_rows_gather_pallas

    b, no, k = 3, 16, 64
    sizes = (1200, 304, 80)                        # pack=8 divides each
    maps = [jnp.asarray(rng.standard_normal((b, n, no)).astype(np.float32))
            for n in sizes]
    n_total = sum(sizes)
    idx = rng.randint(0, n_total, (b, k)).astype(np.int32)
    idx[0, :4] = [0, 7, sizes[0] - 1, sizes[0]]    # boundary rows
    idx[1, :2] = [n_total - 1, n_total - 1]        # repeated last row
    got = np.asarray(candidate_rows_gather_pallas(
        tuple(maps), jnp.asarray(idx), blk=128, interpret=True))
    ref = np.asarray(jnp.take_along_axis(
        jnp.concatenate(maps, axis=1),
        jnp.asarray(idx)[..., None], axis=1))
    np.testing.assert_array_equal(got, ref)



def test_weighted_blend_nms_pallas_matches_jnp(rng):
    """The parallel blend-NMS kernel (keep fixpoint + owner one-hot blends)
    reproduces the sequential fori-loop reference row-for-row — overlaps,
    singletons, degenerate boxes and invalid rows included."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.ops.nms import (sort_by_score,
                                                            weighted_blend_nms)
    from face_detection_and_recognition_tpu.ops.pallas_kernels import \
        weighted_blend_nms_pallas

    k, d, max_out = 64, 17, 16
    base = rng.uniform(0.1, 0.7, (k, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.3, (k, 2)).astype(np.float32)
    dets = np.zeros((k, d), np.float32)
    dets[:, 0:2] = base
    dets[:, 2:4] = base + wh
    # overlapping cluster + a degenerate (inverted) box
    dets[5] = dets[4]; dets[5, :4] += 0.01
    dets[6] = dets[4]; dets[6, :4] += 0.02
    dets[9, 2:4] = dets[9, 0:2] - 0.1
    dets[:, 4:16] = rng.standard_normal((k, 12)).astype(np.float32)
    dets[:, 16] = rng.uniform(0.3, 1.0, k).astype(np.float32)
    valid = np.ones(k, bool)
    valid[-5:] = False

    ref_out, ref_valid = weighted_blend_nms(
        jnp.asarray(dets), jnp.asarray(valid), 0.3, max_out)
    _, _, svalid, sdets = sort_by_score(
        jnp.asarray(dets)[:, -1], jnp.asarray(valid), jnp.asarray(dets))
    rows, keep = weighted_blend_nms_pallas(sdets, svalid, 0.3, interpret=True)
    order = np.argsort(np.where(np.asarray(keep), 0, 1),
                       kind="stable")[:max_out]
    got_out = np.asarray(rows)[order]
    got_valid = np.asarray(keep)[order]
    np.testing.assert_array_equal(got_valid, np.asarray(ref_valid))
    np.testing.assert_allclose(got_out, np.asarray(ref_out),
                               atol=1e-5, rtol=1e-5)


def test_crop_gemm_explicit_channels_grayscale(rng):
    """channels=1 with H divisible by 3: divisibility inference alone would
    mis-split the channels-major image (pre-round-3 bug); the explicit
    channel count keeps single-channel crops exact vs the gather sampler."""
    import jax.numpy as jnp

    import face_detection_and_recognition_tpu.ops.pallas_kernels as PK
    from face_detection_and_recognition_tpu.ops.crop import crop_and_resize

    img = rng.uniform(-1, 1, (300, 256, 1)).astype(np.float32)  # 300 % 3 == 0
    img_cm = jnp.asarray(img).transpose(2, 0, 1).reshape(-1, img.shape[1])
    boxes = jnp.asarray(np.array([[10, 10, 90, 120],
                                  [50, 200, 250, 290]], np.float32))
    valid = jnp.asarray(np.ones(2, np.float32))
    out = np.asarray(PK.crop_gemm_pallas.__wrapped__(
        img_cm, boxes, valid, (24, 24), True, True, jnp.float32, 1))
    assert out.shape == (2, 24, 24)
    ref = np.asarray(crop_and_resize(jnp.asarray(img), boxes, (24, 24),
                                     valid, method="gemm"))
    np.testing.assert_allclose(out.reshape(2, 24, 24, 1), ref, atol=1e-4)
