"""Batch face extraction from class-organized datasets.

TPU-native rebuild of ``face_extraction/extract_faces_from_dataset.py``:
walks ``dataset/class_x/*`` media, detects faces, saves JPEG crops and/or a
zero-padded ``[MAX_N_FRAME_FROM_VID * MAX_N_FACES_PER_FRAME, D]`` feature
array per media (``save_extracted_faces``, ``:330-363``), with per-class
statistics logging (``:449-458``) and resume-by-existence.

The reference's serial per-image loop with per-box python crops becomes:
prefetch-decoded frames -> one fused detect program -> one batched
crop+embed program per frame set. Crop offsets (-6, -1, +4, +5) match
``:290-291``.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Dict, List, Optional

import cv2
import numpy as np

from ..core.engine import FaceEngine
from ..ops.crop import EXTRACTION_OFFSETS
from .dataset import (MAX_N_FACES_PER_FRAME, MAX_N_FRAME_FROM_VID,
                      MediaItem, PrefetchLoader, output_exists,
                      walk_class_tree)

logger = logging.getLogger("face_extraction")


@dataclasses.dataclass
class ExtractionStats:
    classes: Dict[str, Dict[str, int]] = dataclasses.field(default_factory=dict)
    failed: List[str] = dataclasses.field(default_factory=list)
    wall_s: float = 0.0

    def add(self, cls: str, faces: int, feats: int):
        c = self.classes.setdefault(cls, {"media": 0, "faces": 0, "features": 0})
        c["media"] += 1
        c["faces"] += faces
        c["features"] += feats

    def total_faces(self) -> int:
        return sum(c["faces"] for c in self.classes.values())


def save_extracted_faces(
    out_dir: str,
    item: MediaItem,
    crops: List[np.ndarray],
    frame_features: List[Optional[np.ndarray]],
    feature_dim: int,
    save_crops: bool = True,
    save_features: bool = True,
    max_faces_per_frame: int = MAX_N_FACES_PER_FRAME,
) -> None:
    """JPEG crops under out/class/media_stem/, plus the fixed-size
    zero-padded feature array (reference ``save_extracted_faces:330-363``).

    Slot alignment matches the reference: frame i's faces occupy rows
    [i * max_faces_per_frame, (i+1) * max_faces_per_frame) with per-frame
    zero padding, so consumers can attribute features to frames."""
    stem = os.path.splitext(os.path.basename(item.path))[0]
    if save_crops:
        crop_dir = os.path.join(out_dir, item.class_name, stem)
        os.makedirs(crop_dir, exist_ok=True)
        for i, c in enumerate(crops):
            cv2.imwrite(os.path.join(crop_dir, f"face_{i}.jpg"), c)
    if save_features:
        os.makedirs(os.path.join(out_dir, item.class_name), exist_ok=True)
        cap = MAX_N_FRAME_FROM_VID * MAX_N_FACES_PER_FRAME
        padded = np.zeros((cap, feature_dim), np.float32)
        for fi, feats in enumerate(frame_features[:MAX_N_FRAME_FROM_VID]):
            if feats is None or not len(feats):
                continue
            row = fi * max_faces_per_frame
            n = min(len(feats), max_faces_per_frame, cap - row)
            padded[row : row + n] = feats[:n]
        np.save(os.path.join(out_dir, item.class_name, stem + ".npy"), padded)


def extract_faces_from_dataset(
    engine: FaceEngine,
    data_dir: str,
    out_dir: str,
    save_crops: bool = True,
    save_features: bool = True,
    max_faces_per_frame: int = MAX_N_FACES_PER_FRAME,
    num_workers: int = 4,
    resume: bool = True,
) -> ExtractionStats:
    """Run the full extraction job. ``engine`` must carry an embedder when
    save_features is True."""
    t0 = time.time()
    stats = ExtractionStats()
    items = walk_class_tree(data_dir)
    if resume:
        items = [
            it for it in items
            if not output_exists(out_dir, it.class_name, it.path, save_features)
        ]
    os.makedirs(out_dir, exist_ok=True)

    for item, frames in PrefetchLoader(items, num_workers=num_workers):
        try:
            crops: List[np.ndarray] = []
            frame_feats: List[Optional[np.ndarray]] = []
            n_feats = 0
            for _, frame in frames:
                post = engine.detect_image(frame)
                boxes = post.boxes[:max_faces_per_frame]
                h, w = frame.shape[:2]
                for box in boxes:
                    x1, y1, x2, y2 = (int(v) for v in box)
                    x1o, y1o = max(0, x1 - 6), max(0, y1 - 1)
                    x2o, y2o = min(w - 1, x2 + 4), min(h - 1, y2 + 5)
                    crop = frame[y1o:y2o, x1o:x2o]
                    if crop.size:  # degenerate boxes produce empty slices
                        crops.append(crop)
                if save_features and len(boxes):
                    emb = engine.embed_faces(frame, boxes,
                                             offsets=EXTRACTION_OFFSETS)
                    frame_feats.append(emb)
                    n_feats += len(emb)
                else:
                    frame_feats.append(None)
            dim = engine.embed_spec.dim if engine.embed_spec else 512
            save_extracted_faces(out_dir, item, crops, frame_feats, dim,
                                 save_crops, save_features,
                                 max_faces_per_frame)
            stats.add(item.class_name, len(crops), n_feats)
        except Exception:  # per-media failure tolerance (reference :446-448)
            logger.exception("failed on %s", item.path)
            stats.failed.append(item.path)
    stats.wall_s = time.time() - t0
    for cls, c in sorted(stats.classes.items()):
        logger.info("class %s: media=%d faces=%d features=%d",
                    cls, c["media"], c["faces"], c["features"])
    logger.info("total faces=%d failed=%d wall=%.1fs",
                stats.total_faces(), len(stats.failed), stats.wall_s)
    return stats
