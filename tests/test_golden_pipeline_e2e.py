"""Executed END-TO-END pipeline accuracy: the dataset-extraction job run
with REAL trained weights (the committed golden checkpoints) on real
pixels — detect, crop, embed, save — then the similar-face filter's math
on the extracted features. Every other pipeline test runs random weights
and asserts structure; this one asserts the system actually finds the
faces (reference flow: face_extraction/extract_faces_from_dataset.py ->
similar_face_filtering/filter_faces_using_reference.py)."""
import os
import random

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.golden  # golden lane (pyproject addopts)

DATA = os.path.join(os.path.dirname(__file__), "data")
DET_CKPT = os.path.join(DATA, "golden_yolov5n_ckpt")
EMB_CKPT = os.path.join(DATA, "golden_embed_ckpt")

needs_ckpts = pytest.mark.skipif(
    not (os.path.isdir(DET_CKPT) and os.path.isdir(EMB_CKPT)),
    reason="golden checkpoints not trained: make accuracy accuracy-embed")


def _build_tree(root, n_per_class=3, seed=0):
    """dataset/class_x/*.jpg of golden-face composites (one face each)."""
    from face_detection_and_recognition_tpu.train.golden import (
        GOLDEN_BOXES_3, GOLDEN_IMG, extract_golden_faces)

    rng = random.Random(seed)
    faces = extract_golden_faces(GOLDEN_IMG)
    img = cv2.imread(GOLDEN_IMG)
    for cid in range(2):
        cdir = os.path.join(root, f"person_{cid}")
        os.makedirs(cdir, exist_ok=True)
        for j in range(n_per_class):
            # background: top (face-free) strip of the golden image, resized
            bg = cv2.resize(img[:180], (640, 640))
            patch = faces[cid]["patch"]
            box = faces[cid]["box"]
            s = rng.uniform(1.4, 2.0)
            ph, pw = int(patch.shape[0] * s), int(patch.shape[1] * s)
            p = cv2.resize(patch, (pw, ph))
            x0 = rng.randint(0, 640 - pw)
            y0 = rng.randint(0, 640 - ph)
            bg[y0:y0 + ph, x0:x0 + pw] = p
            cv2.imwrite(os.path.join(cdir, f"im{j}.jpg"), bg)
    return root


@needs_ckpts
def test_extraction_pipeline_with_trained_weights(tmp_path):
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.pipelines.extract_faces import (
        extract_faces_from_dataset)

    tree = _build_tree(str(tmp_path / "dataset"))
    eng = FaceEngine(EngineConfig(detector="yolov5n", det_thres=0.5,
                                  embedder="mobile_facenet"))
    eng.load_weights(DET_CKPT)
    eng.load_embed_weights(EMB_CKPT)
    out = str(tmp_path / "out")
    stats = extract_faces_from_dataset(eng, tree, out, block_size=4,
                                       num_workers=2)
    # the trained detector must find faces in most composites
    assert stats.total_faces() >= 4, vars(stats)
    assert not stats.failed, stats.failed
    # saved features: unit-normed rows for real detections
    feats = []
    for cls in ("person_0", "person_1"):
        cdir = os.path.join(out, cls)
        npys = [f for f in os.listdir(cdir) if f.endswith(".npy")]
        assert npys, f"no feature files for {cls}"
        for f in npys:
            # zero-padded [45, D] feature array (reference format)
            arr = np.load(os.path.join(cdir, f))
            feats.append((cls, np.asarray(arr, np.float32)))
    norms = [np.linalg.norm(v, axis=-1) for _, v in feats]
    real = np.concatenate([r[r > 1e-3] for r in norms])
    assert len(real) >= 4
    np.testing.assert_allclose(real, 1.0, atol=1e-2)

    # filter math on the REAL extracted features: same-identity features
    # cluster tighter than cross-identity ones
    by_cls = {}
    for cls, v in feats:
        rows = v.reshape(-1, v.shape[-1])
        rows = rows[np.linalg.norm(rows, axis=-1) > 1e-3]
        by_cls.setdefault(cls, []).append(rows)
    m0 = np.concatenate(by_cls["person_0"]).mean(0)
    m1 = np.concatenate(by_cls["person_1"]).mean(0)
    r0 = np.concatenate(by_cls["person_0"])
    d_same = np.linalg.norm(r0 - m0, axis=-1).max()
    d_cross = np.linalg.norm(r0 - m1, axis=-1).min()
    assert d_cross > d_same, (d_same, d_cross)


@needs_ckpts
def test_serving_ensemble_with_trained_weights():
    """The Triton-contract serving facade with REAL trained weights: the
    golden image through FaceService.detect_faces yields the 3 pinned faces
    as (-1,1) CHW crops + boxes + confs, and the 0-face frame returns the
    sentinel (reference face_detection_trt_server/inference.py:94-98)."""
    from face_detection_and_recognition_tpu.serving.service import (
        FaceService, ServiceConfig)
    from face_detection_and_recognition_tpu.train.golden import (
        GOLDEN_BOXES_3, GOLDEN_IMG, NEGATIVE_IMG, match_golden)

    svc = FaceService(ServiceConfig(detector="yolov5n", det_thres=0.5,
                                    bbox_area_thres=0.12))
    svc.engine.load_weights(DET_CKPT)
    svc.engine.load_embed_weights(EMB_CKPT)

    img = cv2.imread(GOLDEN_IMG)
    faces, bboxes, confs = svc.detect_faces(img)
    assert faces.shape[0] == 3, faces.shape
    assert faces.shape[1:] == (3, 112, 112)
    assert float(np.abs(faces).max()) <= 1.0 + 1e-5
    ious = match_golden(np.asarray(bboxes, np.float32), GOLDEN_BOXES_3)
    assert all(i >= 0.5 for i in ious), ious
    assert (np.asarray(confs).reshape(-1) >= 0.5).all()

    neg = cv2.imread(NEGATIVE_IMG)
    nfaces, nbboxes, nconfs = svc.detect_faces(neg)
    assert nfaces.shape[0] == 0
    np.testing.assert_array_equal(np.asarray(nbboxes), [[0, 0, 0, 0]])


@needs_ckpts
def test_video_inference_with_trained_weights(tmp_path):
    """The video driver (micro-batched, double-buffered) with the trained
    detector: a synthetic clip of golden-face composites comes back with
    per-frame REAL detections and a written annotated output video
    (reference modules/utils/inference.py:96-111)."""
    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.core.inference import (
        inference_vid)
    from face_detection_and_recognition_tpu.train.golden import (
        GOLDEN_IMG, extract_golden_faces)

    rng = random.Random(0)
    faces = extract_golden_faces(GOLDEN_IMG)
    img = cv2.imread(GOLDEN_IMG)
    vid_path = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (640, 360))
    n_frames = 12
    for i in range(n_frames):
        bg = cv2.resize(img[:180], (640, 360))
        f = faces[i % 3]
        patch, box = f["patch"], f["box"]
        s = rng.uniform(1.0, 1.4)
        p = cv2.resize(patch, (int(patch.shape[1] * s),
                               int(patch.shape[0] * s)))
        ph, pw = p.shape[:2]
        x0 = rng.randint(0, 640 - pw)
        y0 = rng.randint(0, 360 - ph)
        bg[y0:y0 + ph, x0:x0 + pw] = p
        vw.write(bg)
    vw.release()

    eng = FaceEngine(EngineConfig(detector="yolov5n", det_thres=0.5))
    eng.load_weights(DET_CKPT)
    out_path = str(tmp_path / "out.mp4")
    results = inference_vid(eng, vid_path, output=out_path, display=False,
                            micro_batch=4)
    assert len(results) == n_frames
    frames_with_faces = sum(1 for r in results if len(r.boxes))
    assert frames_with_faces >= n_frames * 2 // 3, frames_with_faces
    out = cv2.VideoCapture(out_path)
    assert int(out.get(cv2.CAP_PROP_FRAME_COUNT)) == n_frames
    out.release()
