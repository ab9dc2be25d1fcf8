"""NMS parity tests: each variant vs a direct numpy port of its reference
python-loop semantics (yolov5-face custom NMS, BlazeFace weighted-blend NMS,
torchvision-style hard NMS, MTCNN union/min NMS)."""
import numpy as np
import pytest

from face_detection_and_recognition_tpu.ops import nms as N


def np_iou(b1, b2, plus1=False, eps=0.0, mode="union"):
    off = 1.0 if plus1 else 0.0
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:4], b2[None, :, 2:4])
    wh = np.clip(rb - lt + off, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0] + off) * (b1[:, 3] - b1[:, 1] + off)
    a2 = (b2[:, 2] - b2[:, 0] + off) * (b2[:, 3] - b2[:, 1] + off)
    if mode == "min":
        return inter / np.minimum(a1[:, None], a2[None, :])
    return inter / (a1[:, None] + a2[None, :] - inter + eps)


def ref_greedy_nms(boxes, scores, thres, plus1=False, strict=True, mode="union"):
    """Direct loop implementation of greedy NMS; returns kept indices."""
    order = np.argsort(-scores, kind="stable")
    kept = []
    while len(order):
        i = order[0]
        kept.append(i)
        if len(order) == 1:
            break
        ious = np_iou(
            boxes[i : i + 1], boxes[order[1:]], plus1=plus1,
            eps=1e-16 if plus1 else 0.0, mode=mode,
        )[0]
        keep = ious <= thres if strict else ious < thres
        order = order[1:][keep]
    return kept


def random_boxes(rng, n, size=100.0):
    pts = rng.uniform(0, size, (n, 2, 2))
    return np.concatenate([pts.min(1), pts.min(1) + rng.uniform(2, 40, (n, 2))], -1).astype(
        np.float32
    )


@pytest.mark.parametrize("plus1,strict,mode", [
    (False, True, "union"),   # torchvision convention
    (True, False, "union"),   # yolov5-face custom NMS convention
    (False, False, "union"),
    (True, False, "min"),     # MTCNN stage convention
])
def test_greedy_nms_matches_loop_reference(rng, plus1, strict, mode):
    for trial in range(5):
        n = 64
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        valid = np.ones(n, bool)
        keep = np.asarray(
            N.greedy_nms_mask(boxes, scores, valid, 0.4, plus1=plus1, strict=strict, mode=mode)
        )
        ref = ref_greedy_nms(boxes, scores, 0.4, plus1=plus1, strict=strict, mode=mode)
        assert sorted(np.nonzero(keep)[0].tolist()) == sorted(ref)


def test_greedy_nms_respects_validity_mask(rng):
    boxes = random_boxes(rng, 16)
    scores = rng.uniform(0.01, 1.0, 16).astype(np.float32)
    valid = np.zeros(16, bool)
    valid[:4] = True
    keep = np.asarray(N.greedy_nms_mask(boxes, scores, valid, 0.5))
    assert not keep[4:].any()


def test_greedy_nms_fixed_output(rng):
    boxes = random_boxes(rng, 32)
    scores = rng.uniform(0.01, 1.0, 32).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], -1)
    out, out_valid = N.greedy_nms(dets, np.ones(32, bool), 0.5, max_out=8)
    out, out_valid = np.asarray(out), np.asarray(out_valid)
    assert out.shape == (8, 5)
    s = out[out_valid][:, 4]
    assert (np.diff(s) <= 1e-6).all()  # sorted desc by score


def ref_weighted_blend_nms(dets, thres=0.3):
    """Direct port of the blazeface weighted NMS loop semantics
    (blazeface.py:404-458) for testing; dets rows = [y,x,y,x,kps...,score]."""
    if len(dets) == 0:
        return []
    out = []
    remaining = np.argsort(-dets[:, -1], kind="stable")
    while len(remaining):
        det = dets[remaining[0]]
        first = det[:4][None]
        others = dets[remaining, :4]
        # blazeface boxes are ymin,xmin,ymax,xmax; jaccard is axis-symmetric
        ious = np_iou(first, others)[0]
        mask = ious > thres
        overlapping = remaining[mask]
        remaining = remaining[~mask]
        w = det.copy()
        if len(overlapping) > 1:
            coords = dets[overlapping, :-1]
            scores = dets[overlapping, -1:]
            total = scores.sum()
            w[:-1] = (coords * scores).sum(0) / total
            w[-1] = total / len(overlapping)
        out.append(w)
    return out


def test_weighted_blend_nms_matches_reference(rng):
    for trial in range(5):
        n = 40
        boxes = random_boxes(rng, n) / 100.0
        boxes_yx = boxes[:, [1, 0, 3, 2]]
        kps = rng.uniform(0, 1, (n, 12)).astype(np.float32)
        scores = rng.uniform(0.3, 1.0, (n, 1)).astype(np.float32)
        dets = np.concatenate([boxes_yx, kps, scores], -1)
        ref = ref_weighted_blend_nms(dets)
        out, out_valid = N.weighted_blend_nms(dets, np.ones(n, bool), 0.3, max_out=n)
        out, out_valid = np.asarray(out), np.asarray(out_valid)
        assert out_valid.sum() == len(ref)
        got = out[out_valid]
        np.testing.assert_allclose(got, np.stack(ref), rtol=1e-4, atol=1e-5)


def test_weighted_blend_nms_empty():
    dets = np.zeros((8, 17), np.float32)
    out, out_valid = N.weighted_blend_nms(dets, np.zeros(8, bool), 0.3, max_out=4)
    assert not np.asarray(out_valid).any()


def test_multiclass_nms_class_separation(rng):
    # two heavily-overlapping boxes of different classes must both survive
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1])
    dets, valid, _ = N.multiclass_nms(boxes, scores, classes, np.ones(2, bool), 0.5)
    assert np.asarray(valid).sum() == 2
    dets_a, valid_a, _ = N.multiclass_nms(
        boxes, scores, classes, np.ones(2, bool), 0.5, agnostic=True
    )
    assert np.asarray(valid_a).sum() == 1


def test_weighted_blend_nms_pads_to_max_out(rng):
    """Fewer candidate rows than max_out still yields the fixed
    [max_out, D]/[max_out] shapes on every backend (the TPU kernel branch
    used to return K rows)."""
    import jax.numpy as jnp

    dets = np.zeros((4, 17), np.float32)
    dets[:, 0:2] = rng.uniform(0.1, 0.4, (4, 2))
    dets[:, 2:4] = dets[:, 0:2] + 0.2
    dets[:, 16] = [0.9, 0.8, 0.7, 0.6]
    valid = np.array([True, True, False, True])
    out, out_valid = N.weighted_blend_nms(
        jnp.asarray(dets), jnp.asarray(valid), 0.3, max_out=16)
    assert np.asarray(out).shape == (16, 17)
    assert np.asarray(out_valid).shape == (16,)
    assert not np.asarray(out_valid)[4:].any()
    assert (np.asarray(out)[~np.asarray(out_valid)] == 0).all()
