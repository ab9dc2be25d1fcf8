"""Crowded-frame accuracy: the WIDER regime, executed.

Round-3 VERDICT Missing #4: every accuracy number so far derives from
0-4-face composites — nothing exercises the masked fixed-size NMS
formulations near capacity. These tests run trained checkpoints over
16-48-face frames (8-300px faces with rotation/overlap/occlusion,
train/golden.py compose_crowded_image) through the SAME eval path as the
WIDER harness (eval/coco_eval.evaluate_engine_on_wider; reference
eval/eval_face_detector.py:114-151), and pin NMS behavior at max_det
SATURATION: a frame holding more faces than output slots must surface the
top-confidence subset, not garbage.

Two kinds of bar (PARITY.md "Crowded-frame AP" table):
* the BASE golden checkpoints (trained on 0-4 upright faces >= 10px) are
  measured under honest distribution shift — their floors are low and say
  so: the crowded set's log-uniform 8-300px draw puts half the faces below
  ~50px with rotation up to 25 deg, a regime those checkpoints never saw;
* the CROWDED-trained checkpoint (make accuracy-crowded: same arch, same
  loss, crowded composites mixed into training) carries the real
  capability claim.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.golden  # golden lane (needs trained checkpoints)

DATA = os.path.join(os.path.dirname(__file__), "data")
Y5N_CKPT = os.path.join(DATA, "golden_yolov5n_ckpt")
SSD_CKPT = os.path.join(DATA, "golden_ssd_ckpt")
MTCNN_CKPT = os.path.join(DATA, "golden_mtcnn_ckpt")
CROWDED_CKPT = os.path.join(DATA, "golden_yolov5n_crowded_ckpt")


@pytest.fixture(scope="module")
def crowded_set(tmp_path_factory):
    from face_detection_and_recognition_tpu.train.golden import (
        make_crowded_dataset)

    out = str(tmp_path_factory.mktemp("crowded"))
    ann, images_root = make_crowded_dataset(out, n_images=16,
                                            out_wh=(640, 640), seed=11)
    # sanity: the set really is crowded
    n_faces = []
    for line in open(ann):
        if line.strip().isdigit():
            n_faces.append(int(line))
    assert sum(n_faces) / len(n_faces) >= 12, n_faces
    assert max(n_faces) >= 24, n_faces
    return ann, images_root


def _eval(detector, ckpt, ann, images_root, overrides=None, max_det=300):
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.eval.coco_eval import (
        evaluate_engine_on_wider)

    eng = FaceEngine(EngineConfig(detector=detector, det_thres=0.02,
                                  bbox_area_thres=0.0, max_det=max_det,
                                  detector_overrides=overrides or {}))
    eng.load_weights(ckpt)
    return evaluate_engine_on_wider(eng, ann, images_root, batch_size=8)


@pytest.mark.skipif(not os.path.isdir(Y5N_CKPT),
                    reason="golden checkpoint not trained: make accuracy")
def test_yolov5n_base_crowded_ap_floor(crowded_set):
    """BASE yolov5n under crowd distribution shift: measures AP50 0.212
    on the round-5 visibility-honest seed-11 set (labels for buried faces
    dropped) — recall is bounded by the sub-10px rotated tail its training
    never contained. Floor asserts measured-minus-drift; the capability
    claim lives with the crowded-trained checkpoints below."""
    ann, images_root = crowded_set
    m = _eval("yolov5n", Y5N_CKPT, ann, images_root)
    assert m["AP50"] >= 0.15, m


Y5S_CKPT = os.path.join(DATA, "golden_yolov5s_ckpt")


@pytest.mark.skipif(not os.path.isdir(Y5S_CKPT),
                    reason="golden checkpoint not trained: make accuracy-s")
def test_yolov5s_base_crowded_ap_floor(crowded_set):
    """BASE yolov5s under the same shift: measures AP50 0.244 (honest
    labels) — floor asserts measured-minus-drift."""
    ann, images_root = crowded_set
    m = _eval("yolov5s", Y5S_CKPT, ann, images_root)
    assert m["AP50"] >= 0.17, m


@pytest.mark.skipif(not os.path.isdir(SSD_CKPT),
                    reason="golden checkpoint not trained: make accuracy-ssd")
def test_ssd_resnet10_base_crowded_ap_floor(crowded_set):
    """BASE ssd-resnet10 at its 300px deploy resolution (faces halve
    again): measures AP50 0.211 (honest labels) — floor asserts
    measured-minus-drift."""
    ann, images_root = crowded_set
    m = _eval("ssd-resnet10", SSD_CKPT, ann, images_root,
              overrides={"input_size": (300, 300)})
    assert m["AP50"] >= 0.14, m


@pytest.mark.skipif(not os.path.isdir(MTCNN_CKPT),
                    reason="not trained: make accuracy-mtcnn")
def test_mtcnn_crowded_ap_floor(crowded_set):
    """MTCNN runs its image pyramid at NATIVE resolution, so tiny faces
    keep their pixels: measures AP50 0.534 (honest labels), the best base
    checkpoint on this regime — floor asserts measured-minus-drift."""
    ann, images_root = crowded_set
    m = _eval("mtcnn", MTCNN_CKPT, ann, images_root)
    assert m["AP50"] >= 0.40, m


@pytest.mark.skipif(not os.path.isdir(CROWDED_CKPT),
                    reason="not trained: make accuracy-crowded")
def test_yolov5n_crowded_trained_ap(crowded_set):
    """The CROWDED-trained yolov5n (make accuracy-crowded): trained with
    16-48-face composites mixed in, it must hold a real bar on the
    held-out crowded set AND still pass the plain golden gate (asserted
    separately below). Measures AP50 0.881 on the round-5 honest-label
    set (the round-4 0.40 "capability ceiling" was label noise: the old
    composer labeled faces later pastes buried — mean 61% coverage on the
    never-detected GT; no detector, and no WIDER annotator, sees those) —
    floor asserts measured-minus-drift."""
    ann, images_root = crowded_set
    m = _eval("yolov5n", CROWDED_CKPT, ann, images_root)
    assert m["AP50"] >= 0.75, m


@pytest.mark.skipif(not os.path.isdir(CROWDED_CKPT),
                    reason="not trained: make accuracy-crowded")
def test_crowded_trained_still_passes_plain_golden_gate():
    """Crowd training must not forget the original contract: the crowded
    checkpoint passes the standard 3-face golden band gate."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.train.golden import (
        evaluate_golden)

    eng = FaceEngine(EngineConfig(detector="yolov5n", det_thres=0.5))
    eng.load_weights(CROWDED_CKPT)
    r = evaluate_golden(eng, det_thres=0.6, margin=0.15)
    assert r["ok"], r
    assert r["n_pos"] == 3 and r["n_neg"] == 0, r


@pytest.mark.skipif(not os.path.isdir(CROWDED_CKPT),
                    reason="not trained: make accuracy-crowded")
def test_nms_saturation_keeps_top_confidence_subset(crowded_set):
    """max_det SATURATION: a frame with more faces than output slots.

    Greedy NMS picks survivors in confidence order, so the max_det=8
    engine's output must be EXACTLY the 8 highest-confidence survivors of
    the max_det=64 engine on the same frame — if the masked fixed-size
    formulation ever surfaced padding garbage or dropped a high-conf box
    under saturation, this set equality breaks. Survivors must also be
    real: every kept box overlaps a GT face."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.eval.coco_eval import (
        parse_wider_annotations)
    from face_detection_and_recognition_tpu.train.golden import bbox_iou_xyxy
    from face_detection_and_recognition_tpu.utils.native import read_image_bgr

    ann, images_root = crowded_set
    gt = parse_wider_annotations(ann)
    # the most crowded frame
    rel = max(gt, key=lambda k: len(gt[k]))
    assert len(gt[rel]) >= 24, len(gt[rel])
    img = read_image_bgr(os.path.join(images_root, rel))

    outs = {}
    for md in (8, 64):
        eng = FaceEngine(EngineConfig(detector="yolov5n", det_thres=0.25,
                                      max_det=md))
        eng.load_weights(CROWDED_CKPT)
        post = eng.detect_image(img)
        outs[md] = (np.asarray(post.boxes, np.float32),
                    np.asarray(post.bbox_confs, np.float32))

    b8, c8 = outs[8]
    b64, c64 = outs[64]
    assert len(b8) == 8, len(b8)          # saturated: every slot filled
    assert len(b64) > 8, len(b64)         # the frame really overflows 8
    order = np.argsort(-c64)[:8]
    top8 = b64[order]
    # set equality up to ordering: match every max_det=8 box to a top-8
    # box at IoU ~1 (same pipeline, same survivors)
    used = np.zeros(8, bool)
    for bb in b8:
        ious = [0.0 if used[j] else bbox_iou_xyxy(bb, top8[j])
                for j in range(8)]
        j = int(np.argmax(ious))
        assert ious[j] > 0.99, (bb, top8)
        used[j] = True
    np.testing.assert_allclose(np.sort(c8), np.sort(c64[order]), atol=1e-3)

    # and the survivors are faces, not padding garbage
    gts = np.asarray([[x, y, x + w, y + h] for (x, y, w, h) in
                      np.asarray(gt[rel], np.float32)[:, :4]], np.float32)
    for bb, cc in zip(b8, c8):
        best = max(bbox_iou_xyxy(bb, g) for g in gts)
        assert best >= 0.4, (bb, cc, best)


# ---------------------------------------------------------------------------
# Round-5 VERDICT Missing #3: the remaining golden-gated detector families,
# measured on the SAME seed-11 crowded set. These are documented FLOORS
# under honest distribution shift (none of these base checkpoints trained
# on the crowded regime); the capability claims live with the crowd-trained
# checkpoints above/below. Measured via benchmarks/crowded_all.py.
# Marked slow+golden: five extra engine compiles (~20 min CPU) would bloat
# the golden lane the round-4 tier split protects.
# ---------------------------------------------------------------------------

BLAZE_CKPT = os.path.join(DATA, "golden_blaze_ckpt")
BLAZE_BACK_CKPT = os.path.join(DATA, "golden_blaze_back_ckpt")
N6_CKPT = os.path.join(DATA, "golden_yolov5n6_ckpt")
OV0204_CKPT = os.path.join(DATA, "golden_ov_0204_ckpt")
OVSQ_CKPT = os.path.join(DATA, "golden_ov_sq_ckpt")

_FLOOR_FAMILIES = [
    # (id, detector, ckpt, overrides, measured AP50, floor) — measured on
    # the round-5 VISIBILITY-HONEST seed-11 set (labels for buried faces
    # dropped; see compose_crowded_image)
    # blaze letterboxes 640 crowds to 128/256: the log-uniform 8-300px draw
    # lands half the faces BELOW one anchor cell — measured 0.068/0.154
    ("blazeface-front", "blazeface-front", BLAZE_CKPT, {}, 0.068, 0.03),
    ("blazeface-back", "blazeface-back", BLAZE_BACK_CKPT, {}, 0.154, 0.08),
    # P6 graph at 640: same regime as yolov5n (0.212) plus the extra
    # stride-64 level — measured 0.261
    ("yolov5n6", "yolov5n6", N6_CKPT, {}, 0.261, 0.17),
    # the exact IR topologies at their deploy resolutions — measured
    # 0.246 (448px) / 0.097 (300px)
    ("ov-0204", "ov-0204", OV0204_CKPT, {}, 0.246, 0.15),
    ("ov-squeezenet-light", "ov-squeezenet-light", OVSQ_CKPT, {}, 0.097,
     0.05),
]


@pytest.mark.slow
@pytest.mark.parametrize("fam,det,ckpt,ov,measured,floor",
                         _FLOOR_FAMILIES,
                         ids=[f[0] for f in _FLOOR_FAMILIES])
def test_remaining_family_crowded_ap_floors(crowded_set, fam, det, ckpt,
                                            ov, measured, floor):
    """Every golden-gated detector family now has a crowded-regime number
    (reference regime: eval/eval_face_detector.py:114-151). Floors assert
    measured-minus-drift; the measured values are in _FLOOR_FAMILIES and
    PARITY.md's crowded table."""
    if not os.path.isdir(ckpt):
        pytest.skip(f"not trained: {os.path.basename(ckpt)}")
    ann, images_root = crowded_set
    m = _eval(det, ckpt, ann, images_root, overrides=ov)
    assert m["AP50"] >= floor, (fam, m)


S6_CROWDED_CKPT = os.path.join(DATA, "golden_yolov5s6_crowded_ckpt")


@pytest.mark.skipif(not os.path.isdir(S6_CROWDED_CKPT),
                    reason="not trained: make accuracy-crowded-s6")
def test_yolov5s6_crowded_trained_high_res_ap(crowded_set):
    """Round-5 VERDICT #1: the HIGH-RESOLUTION crowded checkpoint —
    yolov5s6's P6 head crowd-trained at a 960px canvas (make
    accuracy-crowded-s6) — evaluated at input 960 over the 640px seed-11
    set. Measures AP50 0.917 / AP 0.654 on the visibility-honest labels
    (vs 0.881 for crowd-trained yolov5n@640 and 0.212 for base yolov5n):
    past the round-4 0.40 ceiling by 2.3x, and past the reference's own
    published 0.504 WIDER AP50. Floor asserts measured-minus-drift."""
    ann, images_root = crowded_set
    m = _eval("yolov5s6", S6_CROWDED_CKPT, ann, images_root,
              overrides={"input_size": (960, 960)})
    assert m["AP50"] >= 0.80, m
    assert m["AP"] >= 0.50, m


@pytest.mark.skipif(not os.path.isdir(S6_CROWDED_CKPT),
                    reason="not trained: make accuracy-crowded-s6")
def test_s6_crowded_trained_still_passes_plain_golden_gate():
    """Crowd training at 960 must not forget the original contract."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.train.golden import (
        evaluate_golden)

    eng = FaceEngine(EngineConfig(
        detector="yolov5s6", det_thres=0.5,
        detector_overrides={"input_size": (960, 960)}))
    eng.load_weights(S6_CROWDED_CKPT)
    r = evaluate_golden(eng, det_thres=0.6, margin=0.15)
    assert r["ok"], r
    assert r["n_pos"] == 3 and r["n_neg"] == 0, r
