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
