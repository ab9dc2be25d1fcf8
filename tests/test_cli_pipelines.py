"""CLI entry points for the three remaining reference batch pipelines:
extract_and_label (tracking), extract_imdb_wiki, extract_features.

Each test drives the real main() on a synthetic tree — the same contract the
reference's scripts expose (extract_and_label_faces_from_dataset.py:432,
extract_and_clean_imdb_wiki_faces.py:259,
extract_features_from_face_dataset.py:186)."""
import json
import os

import cv2
import numpy as np
import pytest


@pytest.fixture()
def image_tree(tmp_path, rng):
    for cls in ("class_a", "class_b"):
        d = tmp_path / "data" / cls
        d.mkdir(parents=True)
        for i in range(2):
            img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
            cv2.imwrite(str(d / f"img{i}.jpg"), img)
    return tmp_path / "data"


def test_extract_and_label_cli(image_tree, tmp_path):
    from face_detection_and_recognition_tpu.cli.extract_and_label import main

    out = str(tmp_path / "labeled")
    rc = main(["-i", str(image_tree), "-o", out, "--md", "blazeface-front",
               "--dt", "0.1", "--fd", "reid-mnv2", "--labeler", "none",
               "--workers", "2"])
    assert rc == 0
    ann = json.load(open(os.path.join(out, "annotations.json")))
    assert len(ann) == 4  # one entry per media
    for rec in ann.values():
        # aligned per-detection lists (reference annot dict :316-355)
        n = len(rec["face_ids"])
        assert len(rec["boxes"]) == n
        assert len(rec["ages"]) == n == len(rec["genders"])


def test_extract_and_label_pipeline_labels_propagate(image_tree, tmp_path):
    """New tracks get labeled once; re-identified faces reuse the track's
    labels (reference check_if_face_exists label carry-forward)."""
    from face_detection_and_recognition_tpu.core.engine import (EngineConfig,
                                                                FaceEngine)
    from face_detection_and_recognition_tpu.pipelines.tracking import (
        extract_and_label_faces)

    engine = FaceEngine(EngineConfig(detector="blazeface-front",
                                     det_thres=0.05, max_det=4,
                                     embedder="reid-mnv2"))
    calls = []

    def labeler(frame, box):
        calls.append(tuple(box))
        return "25-39", "Male"

    ann = extract_and_label_faces(engine, str(image_tree),
                                  str(tmp_path / "out"), labeler=labeler,
                                  metric="cosine", num_workers=2)
    n_dets = sum(len(a["face_ids"]) for a in ann.values())
    n_new = sum(len(set(a["face_ids"])) for a in ann.values())
    assert len(calls) == n_new  # labeler fires once per NEW track only
    for rec in ann.values():
        assert all(a == "25-39" for a in rec["ages"])
        assert all(g == "Male" for g in rec["genders"])
    if n_dets == 0:
        pytest.skip("random-noise frames produced no detections at 0.05")


def test_extract_features_cli(tmp_path, rng):
    from face_detection_and_recognition_tpu.cli.extract_features import main

    for cls in ("id_x", "id_y"):
        d = tmp_path / "crops" / cls
        d.mkdir(parents=True)
        for i in range(2):
            img = rng.randint(0, 255, (50, 60, 3)).astype(np.uint8)
            cv2.imwrite(str(d / f"f{i}.jpg"), img)
    out = str(tmp_path / "feats")
    rc = main(["-i", str(tmp_path / "crops"), "-o", out,
               "--fd", "mobile_facenet", "--batch", "4"])
    assert rc == 0
    for cls, label in (("id_x", 0.0), ("id_y", 1.0)):
        for i in range(2):
            rec = np.load(os.path.join(out, cls, f"f{i}.npy"))
            assert rec.shape == (513,)  # 512-d features + class label
            assert rec[-1] == label  # alphabetical class map (files.py:51-59)


def test_extract_imdb_wiki_cli(tmp_path, rng):
    from scipy.io import savemat

    from face_detection_and_recognition_tpu.cli.extract_imdb_wiki import main

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    n = 4
    paths = []
    for i in range(n):
        cv2.imwrite(str(img_root / f"p{i}.jpg"),
                    rng.randint(0, 255, (80, 100, 3)).astype(np.uint8))
        paths.append(f"p{i}.jpg")
    full_path = np.empty((1, n), object)
    for i, p in enumerate(paths):
        full_path[0, i] = np.array([p])
    face_score = np.full((1, n), 2.0)
    face_score[0, -1] = 0.1  # one metadata reject -> low_det_score
    savemat(str(tmp_path / "wiki.mat"), {"wiki": {
        "full_path": full_path,
        "dob": np.full((1, n), 715876.0),
        "photo_taken": np.full((1, n), 2000.0),
        "gender": np.ones((1, n)),
        "face_score": face_score,
        "second_face_score": np.full((1, n), np.nan),
    }})
    out = str(tmp_path / "wiki_out")
    rc = main(["--mat", str(tmp_path / "wiki.mat"), "--db", "wiki",
               "-i", str(img_root), "-o", out, "--md", "blazeface-front",
               "--mf", "mobile_facenet", "--dt", "0.2", "--batch", "2"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "data.npy"))
    meta = json.load(open(os.path.join(out, "cleaning_metadata.json")))
    assert meta["kept_metadata"] == n - 1
    assert meta["removed"] == {"low_det_score": 1}
    recs = np.load(os.path.join(out, "data.npy"), allow_pickle=True)
    assert meta["records_written"] == len(recs)


def test_interactive_labeler_key_machine(monkeypatch, rng):
    """The cv2-waitKey labeler replicates the reference's manual flow
    (extract_and_label_faces_from_dataset.py:194-234): w/e pick gender,
    1-5 pick the age bucket, ESC skips with Unknowns."""
    import cv2 as cv2mod

    from face_detection_and_recognition_tpu.pipelines.tracking import (
        interactive_labeler)

    shown = []
    monkeypatch.setattr(cv2mod, "imshow", lambda name, img: shown.append(img))
    monkeypatch.setattr(cv2mod, "destroyWindow", lambda name: None)
    frame = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    box = np.array([10, 10, 40, 40], np.float32)

    keys = iter([ord("w"), ord("3")])  # Male, then bucket 3
    monkeypatch.setattr(cv2mod, "waitKey", lambda *_: next(keys))
    assert interactive_labeler()(frame, box) == ("25-39", "Male")
    assert shown and shown[0].shape == (30, 30, 3)

    keys = iter([ord("1"), ord("e")])  # age first, then Female
    monkeypatch.setattr(cv2mod, "waitKey", lambda *_: next(keys))
    assert interactive_labeler()(frame, box) == ("0-13", "Female")

    keys = iter([27])  # ESC -> Unknowns
    monkeypatch.setattr(cv2mod, "waitKey", lambda *_: next(keys))
    assert interactive_labeler()(frame, box) == ("Unknown", "Unknown")
