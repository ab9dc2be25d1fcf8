"""Face tracking by embedding distance + IoU gating, and labeled extraction.

Rebuild of ``face_extraction/extract_and_label_faces_from_dataset.py``:
a face matches an existing track when
``(dist < 1.0 and iou > 0.1) or dist < 0.72`` (``:101-116``), with L2
distance for mobile_facenet embeddings and cosine distance for the reid
embedder (``:103-106``). Tracks reset per video (``:416``). The reference's
interactive cv2-waitKey age/gender labeling (``:194-234``) becomes a
pluggable ``labeler`` callback (the batched age/gender heads provide an
automatic one).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..ops.boxes import iou_single

DIST_IOU_GATE = (1.0, 0.1)   # (dist <, iou >)
DIST_ONLY_GATE = 0.72


def embedding_distance(a: np.ndarray, b: np.ndarray, metric: str = "l2") -> float:
    if metric == "l2":
        return float(np.linalg.norm(a - b))
    if metric == "cosine":
        denom = (np.linalg.norm(a) * np.linalg.norm(b)) or 1e-12
        return float(1.0 - (a @ b) / denom)
    raise ValueError(metric)


@dataclasses.dataclass
class Track:
    face_id: int
    embedding: np.ndarray
    box: np.ndarray
    age: Optional[str] = None
    gender: Optional[str] = None


class FaceTracker:
    """Greedy match-or-create tracker (reference
    ``Net.check_if_face_exists/add_face``)."""

    def __init__(self, metric: str = "l2"):
        self.metric = metric
        self.tracks: List[Track] = []
        self._next_id = 0

    def reset(self) -> None:
        """Per-video track reset (reference ``:416``)."""
        self.tracks.clear()

    def match_or_add(self, embedding: np.ndarray, box: np.ndarray) -> Tuple[Track, bool]:
        """Returns (track, is_new). Matches update the stored embedding/box
        and carry the track's age/gender labels forward (the reference reuses
        labels on re-identified faces, check_if_face_exists)."""
        for tr in self.tracks:
            dist = embedding_distance(embedding, tr.embedding, self.metric)
            iou = float(iou_single(box.astype(np.float32),
                                   tr.box.astype(np.float32)))
            if (dist < DIST_IOU_GATE[0] and iou > DIST_IOU_GATE[1]) or (
                dist < DIST_ONLY_GATE
            ):
                tr.embedding = embedding
                tr.box = box
                return tr, False
        tr = Track(self._next_id, embedding, box)
        self._next_id += 1
        self.tracks.append(tr)
        return tr, True


def auto_age_gender_labeler(engine) -> Callable:
    """Labeler backed by the batched age/gender heads — the headless
    replacement for the reference's interactive waitKey labeling."""

    def label(frame: np.ndarray, box: np.ndarray) -> Tuple[str, str]:
        import jax.numpy as jnp

        from ..models.age_gender import AGE_BUCKETS, GENDERS
        from ..ops import preprocess as P
        from ..ops.crop import crop_and_resize, pad_boxes

        h, w = frame.shape[:2]
        b = pad_boxes(jnp.asarray(box[None], jnp.float32), (-5, -5, 5, 5),
                      img_wh=(w, h))
        crops = crop_and_resize(jnp.asarray(frame), b, (227, 227))
        crops = crops - jnp.asarray(P.AGE_GENDER.mean, jnp.float32)
        a, g = engine._classify_ag(engine.ag_vars[0], engine.ag_vars[1], crops)
        return (AGE_BUCKETS[int(np.asarray(a)[0].argmax())],
                GENDERS[int(np.asarray(g)[0].argmax())])

    return label


def interactive_labeler() -> Callable:
    """cv2-waitKey labeler matching the reference's manual flow
    (``extract_and_label_faces_from_dataset.py:194-234``): shows the face
    crop, 'w'/'e' pick gender Male/Female, '1'-'5' pick an age bucket."""
    import cv2

    age_buckets = ("0-13", "14-24", "25-39", "40-59", "60-100")

    def label(frame: np.ndarray, box: np.ndarray) -> Tuple[str, str]:
        x1, y1, x2, y2 = (max(0, int(v)) for v in box)
        crop = frame[y1:y2, x1:x2]
        cv2.imshow("label face: w/e=gender M/F, 1-5=age", crop)
        gender = age = None
        while gender is None or age is None:
            key = cv2.waitKey(0) & 0xFF
            if key == ord("w"):
                gender = "Male"
            elif key == ord("e"):
                gender = "Female"
            elif ord("1") <= key <= ord("5"):
                age = age_buckets[key - ord("1")]
            elif key == 27:  # ESC skips
                gender = gender or "Unknown"
                age = age or "Unknown"
        cv2.destroyWindow("label face: w/e=gender M/F, 1-5=age")
        return age, gender

    return label


def extract_and_label_faces(
    engine,
    data_dir: str,
    out_dir: str,
    labeler: Optional[Callable] = None,
    metric: str = "l2",
    num_workers: int = 4,
) -> Dict[str, dict]:
    """Labeled extraction: per media, detections are tracked across frames
    and annotated with face_ids (+ age/gender when a labeler is given).
    Returns the annotation dict {media: {face_ids, ages, genders, boxes}}
    (reference annot dict ``:316-355``)."""
    import os

    from ..ops.crop import EXTRACTION_OFFSETS
    from .dataset import PrefetchLoader, walk_class_tree
    from ..utils.files import write_json

    annotations: Dict[str, dict] = {}
    items = walk_class_tree(data_dir)
    os.makedirs(out_dir, exist_ok=True)
    for item, frames in PrefetchLoader(items, num_workers=num_workers):
        tracker = FaceTracker(metric=metric)  # reset per media
        ann = {"face_ids": [], "ages": [], "genders": [], "boxes": []}
        for _, frame in frames:
            post = engine.detect_image(frame)
            if not len(post.boxes):
                continue
            emb = engine.embed_faces(frame, post.boxes,
                                     offsets=EXTRACTION_OFFSETS)
            for box, e in zip(post.boxes, emb):
                track, is_new = tracker.match_or_add(e, np.asarray(box))
                if labeler is not None and is_new:
                    track.age, track.gender = labeler(frame, np.asarray(box))
                # one aligned entry PER detection; matched faces reuse the
                # track's labels instead of being skipped
                ann["face_ids"].append(int(track.face_id))
                ann["boxes"].append([int(v) for v in box])
                ann["ages"].append(track.age)
                ann["genders"].append(track.gender)
        key = os.path.join(item.class_name, os.path.basename(item.path))
        annotations[key] = ann
    write_json(annotations, os.path.join(out_dir, "annotations.json"))
    return annotations
