"""COCO-style evaluation: sanity properties + WIDER annotation parsing."""
import numpy as np
import pytest

from face_detection_and_recognition_tpu.eval.coco_eval import (
    evaluate_detections, parse_wider_annotations)


def test_perfect_detections_give_ap1():
    gts = {0: np.array([[10, 10, 20, 20], [50, 50, 30, 30]], float)}
    dets = {0: np.array([[10, 10, 20, 20, 0.9], [50, 50, 30, 30, 0.8]], float)}
    m = evaluate_detections(gts, dets)
    assert m["AP"] == pytest.approx(1.0, abs=1e-6)
    assert m["AP50"] == pytest.approx(1.0, abs=1e-6)
    assert m["AR"] == pytest.approx(1.0, abs=1e-6)


def test_no_detections_give_zero():
    gts = {0: np.array([[10, 10, 20, 20]], float)}
    m = evaluate_detections(gts, {})
    assert m["AP"] == 0.0 and m["AR"] == 0.0


def test_false_positives_reduce_ap():
    gts = {0: np.array([[10, 10, 20, 20]], float)}
    good = {0: np.array([[10, 10, 20, 20, 0.9]], float)}
    with_fp = {0: np.array([[10, 10, 20, 20, 0.5],
                            [100, 100, 20, 20, 0.9]], float)}
    ap_good = evaluate_detections(gts, good)["AP"]
    ap_fp = evaluate_detections(gts, with_fp)["AP"]
    assert ap_fp < ap_good


def test_loose_boxes_pass_ap50_not_ap75():
    # ~60% IoU box: counts at 0.5 threshold, not at 0.75
    gts = {0: np.array([[0, 0, 100, 100]], float)}
    dets = {0: np.array([[0, 0, 80, 80, 0.9]], float)}  # IoU = 0.64
    m = evaluate_detections(gts, dets)
    assert m["AP50"] > 0.9
    assert m["AP75"] == 0.0
    assert 0 < m["AP"] < m["AP50"]


def test_duplicate_detections_penalized():
    # a duplicate ranked above the second object's TP costs precision
    gts = {0: np.array([[10, 10, 20, 20], [100, 100, 20, 20]], float)}
    dup = {0: np.array([[10, 10, 20, 20, 0.9],
                        [11, 11, 20, 20, 0.8],      # duplicate -> FP
                        [100, 100, 20, 20, 0.7]], float)}
    m = evaluate_detections(gts, dup)
    assert 0.5 < m["AP50"] < 1.0


def test_parse_wider_annotations(tmp_path):
    ann = tmp_path / "gt.txt"
    ann.write_text(
        "0--Parade/0_Parade_1.jpg\n2\n10 20 30 40 0 0 0 0 0 0\n"
        "50 60 70 80 0 0 0 0 0 0\n"
        "0--Parade/0_Parade_2.jpg\n0\n0 0 0 0 0 0 0 0 0 0\n"
    )
    gt = parse_wider_annotations(str(ann))
    assert len(gt) == 2
    np.testing.assert_array_equal(gt["0--Parade/0_Parade_1.jpg"],
                                  [[10, 20, 30, 40], [50, 60, 70, 80]])
    assert gt["0--Parade/0_Parade_2.jpg"].shape == (0, 4)


def test_vectorized_matcher_equals_bruteforce(rng=np.random.RandomState(7)):
    """The threshold-vectorized greedy matcher must reproduce the classic
    per-threshold triple loop on random scenes."""
    from face_detection_and_recognition_tpu.eval.coco_eval import (
        IOU_THRESHOLDS, _iou_xywh,
    )

    def brute(gts, dets):
        iou = _iou_xywh(dets[:, :4], gts)
        matched = np.zeros((len(IOU_THRESHOLDS), len(dets)), bool)
        for t, thr in enumerate(IOU_THRESHOLDS):
            taken = np.zeros(len(gts), bool)
            for di in range(len(dets)):
                best, best_iou = -1, thr
                for gi in range(len(gts)):
                    if not taken[gi] and iou[di, gi] >= best_iou:
                        best, best_iou = gi, iou[di, gi]
                if best >= 0:
                    taken[best] = True
                    matched[t, di] = True
        return matched

    for _ in range(20):
        m, n = rng.randint(1, 12), rng.randint(1, 20)
        gts = np.concatenate([rng.uniform(0, 80, (m, 2)),
                              rng.uniform(5, 40, (m, 2))], axis=1)
        # detections jittered around gts + noise
        base = gts[rng.randint(0, m, n)]
        dets = base + rng.uniform(-6, 6, (n, 4))
        dets[:, 2:] = np.abs(dets[:, 2:]) + 1
        scores = -np.sort(-rng.uniform(0, 1, n))  # score-desc like the caller
        d5 = np.concatenate([dets, scores[:, None]], axis=1)

        ref = brute(gts, d5)
        got = evaluate_detections({0: gts}, {0: d5})
        ref_metrics = None
        # compare end metrics by rebuilding with the brute matcher result:
        # identical matched masks => identical AP/AR, so compare masks via
        # a tiny re-implementation hook: recompute with monkeypatched loop
        # is overkill — instead assert the public metrics match a manual
        # computation from `ref`.
        tp = ref.cumsum(axis=1)
        fp = (~ref).cumsum(axis=1)
        recall = tp / m
        prec = tp / np.maximum(tp + fp, 1e-12)
        aps = []
        for t in range(len(IOU_THRESHOLDS)):
            p = prec[t].copy()
            for i in range(len(p) - 1, 0, -1):
                p[i - 1] = max(p[i - 1], p[i])
            idx = np.searchsorted(recall[t], np.linspace(0, 1, 101), "left")
            pa = np.where(idx < len(p), p[np.minimum(idx, len(p) - 1)], 0.0)
            aps.append(pa.mean())
        assert got["AP"] == pytest.approx(float(np.mean(aps)), abs=1e-9)
        assert got["AR"] == pytest.approx(float(recall[:, -1].mean()), abs=1e-9)


def test_matcher_wider_scale_walltime():
    """WIDER-val scale dry-run: 3200 synthetic images, ~11 gts and ~25 dets
    each, 10 IoU thresholds — must evaluate in seconds, not minutes
    (VERDICT r1 weak #8)."""
    import time

    rng = np.random.RandomState(0)
    gts, dets = {}, {}
    for i in range(3200):
        m = rng.randint(1, 22)
        n = rng.randint(1, 50)
        g = np.concatenate([rng.uniform(0, 900, (m, 2)),
                            rng.uniform(8, 120, (m, 2))], axis=1)
        base = g[rng.randint(0, m, n)]
        d = base + rng.uniform(-10, 10, (n, 4))
        d[:, 2:] = np.abs(d[:, 2:]) + 2
        gts[i] = g
        dets[i] = np.concatenate([d, rng.uniform(0, 1, (n, 1))], axis=1)
    t0 = time.time()
    out = evaluate_detections(gts, dets)
    wall = time.time() - t0
    assert 0.0 < out["AP"] <= 1.0
    assert wall < 60.0, f"matcher too slow for WIDER scale: {wall:.1f}s"


def test_batched_wider_runner_matches_per_image(tmp_path):
    """evaluate_engine_on_wider's block path (host letterbox + batched
    detect + host unletterbox) must give the same metrics as the per-image
    engine path."""
    import cv2

    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)
    from face_detection_and_recognition_tpu.eval.coco_eval import (
        _dets_to_xywh, evaluate_engine_on_wider,
    )

    rng = np.random.RandomState(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    lines = []
    for i in range(5):
        h, w = rng.choice([96, 128]), rng.choice([128, 160])
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        lines += [f"im{i}.jpg", "1",
                  f"{rng.randint(0, 20)} {rng.randint(0, 20)} 30 30 0 0"]
    ann = tmp_path / "gt.txt"
    ann.write_text("\n".join(lines) + "\n")

    engine = FaceEngine(EngineConfig(detector="blazeface-front",
                                     det_thres=0.2, bbox_area_thres=0.0,
                                     max_det=8))
    batched = evaluate_engine_on_wider(engine, str(ann), str(img_dir),
                                       batch_size=4)

    from face_detection_and_recognition_tpu.eval.coco_eval import (
        evaluate_detections, parse_wider_annotations,
    )
    from face_detection_and_recognition_tpu.utils.native import read_image_bgr

    gt = parse_wider_annotations(str(ann))
    gtb, detb = {}, {}
    for img_id, rel in enumerate(sorted(gt)):
        img = read_image_bgr(str(img_dir / rel))
        gtb[img_id] = gt[rel]
        post = engine.detect_image(img)
        if len(post.boxes):
            detb[img_id] = _dets_to_xywh(post)
    per_image = evaluate_detections(gtb, detb)
    assert batched["AP"] == pytest.approx(per_image["AP"], abs=0.05)
    assert batched["AR"] == pytest.approx(per_image["AR"], abs=0.05)


def test_matcher_tie_breaking_matches_classic_loop():
    """Duplicate GT boxes with exactly equal IoU: the classic loop's >=
    update assigns the LAST tied gt, leaving earlier ones for later dets
    (round-2 review regression)."""
    g = np.array([[10, 10, 20, 20], [10, 10, 20, 20]], float)  # identical
    # det1 overlaps both equally; det2 only overlaps via the same box too
    d = np.array([[10, 10, 20, 20, 0.9], [10, 10, 20, 20, 0.8]], float)
    out = evaluate_detections({0: g}, {0: d})
    # both dets must match (one gt each) -> perfect AP/AR
    assert out["AP"] == pytest.approx(1.0, abs=1e-6)
    assert out["AR"] == pytest.approx(1.0, abs=1e-6)


def test_unreadable_images_count_as_missed_gt(tmp_path):
    """An undecodable image keeps its GT in the denominator (its faces are
    misses) — silently dropping it inflated AP/AR."""
    import cv2

    from face_detection_and_recognition_tpu.eval.coco_eval import (
        evaluate_engine_on_wider)

    d = tmp_path / "imgs" / "0--Parade"
    d.mkdir(parents=True)
    img = np.zeros((64, 64, 3), np.uint8)
    cv2.imwrite(str(d / "ok.jpg"), img)
    (d / "corrupt.jpg").write_bytes(b"not an image")
    ann = tmp_path / "gt.txt"
    ann.write_text(
        "0--Parade/ok.jpg\n1\n10 10 20 20 0 0 0 0 0 0\n"
        "0--Parade/corrupt.jpg\n1\n10 10 20 20 0 0 0 0 0 0\n"
    )

    class _Post:
        boxes = np.asarray([[10.0, 10.0, 30.0, 30.0]])
        bbox_confs = np.asarray([0.9])

    class _Eng:  # native-resolution branch: detect_image per readable image
        input_size = (-1, -1)

        def detect_image(self, img):
            return _Post()

    m = evaluate_engine_on_wider(_Eng(), str(ann), str(tmp_path / "imgs"))
    # 2 GT boxes total; only 1 (perfectly) detected -> recall capped at 0.5
    # (the old behavior dropped the unreadable image's GT -> AP = AR = 1.0)
    assert m["AR"] <= 0.5 + 1e-6
    assert m["AP50"] <= 0.51  # 101-point interpolation of precision=1 @ r<=.5
