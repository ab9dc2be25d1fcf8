"""Per-image feature extraction from face-crop datasets.

Rebuild of ``face_extraction/extract_features_from_face_dataset.py``: a tree
of already-cropped face images -> per-image feature ``.npy`` records with
class labels from a pickle/json map (``:126-183``). Batched through the
embedder instead of per-image predict calls.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import cv2
import numpy as np

from ..utils.files import read_json, read_pickle


def load_class_map(path: Optional[str], data_dir: str) -> Dict[str, int]:
    if path is None:
        classes = sorted(
            os.path.basename(d)
            for d in glob.glob(os.path.join(data_dir, "*"))
            if os.path.isdir(d)
        )
        return {c: i for i, c in enumerate(classes)}
    if path.endswith((".pkl", ".pickle")):
        return read_pickle(path)
    return read_json(path)


def extract_features_from_face_dataset(
    engine,
    data_dir: str,
    out_dir: str,
    class_map_path: Optional[str] = None,
    batch_size: int = 64,
    resume: bool = True,
) -> int:
    """For each face crop image, save ``[D+1]`` array [features..., label]
    as ``out/class/stem.npy``. Returns number of records written."""
    if engine.embed_spec is None:
        raise RuntimeError("engine built without an embedder")
    class_map = load_class_map(class_map_path, data_dir)
    written = 0
    for cls, label in class_map.items():
        cls_dir = os.path.join(data_dir, cls)
        if not os.path.isdir(cls_dir):
            continue
        out_cls = os.path.join(out_dir, cls)
        os.makedirs(out_cls, exist_ok=True)
        paths = sorted(
            p for p in glob.glob(os.path.join(cls_dir, "*"))
            if os.path.splitext(p)[1].lower() in
            (".jpg", ".jpeg", ".png", ".bmp")
        )
        if resume:
            paths = [
                p for p in paths
                if not os.path.exists(os.path.join(
                    out_cls, os.path.splitext(os.path.basename(p))[0] + ".npy"
                ))
            ]
        ew, eh = engine.embed_spec.input_size
        for i in range(0, len(paths), batch_size):
            chunk = paths[i : i + batch_size]
            from ..utils.native import read_image_bgr

            imgs = [read_image_bgr(p) for p in chunk]
            pairs = [(p, im) for p, im in zip(chunk, imgs) if im is not None]
            if not pairs:
                continue
            # the images ARE the face crops: host-resize to the embedder
            # input and run the whole chunk as ONE batched device program
            # (per-image embed_faces dispatches cost several ms each)
            batch = np.stack([cv2.resize(im, (ew, eh)) for _, im in pairs])
            feats = engine.embed_crops(batch)
            for (p, _), f in zip(pairs, feats):
                stem = os.path.splitext(os.path.basename(p))[0]
                rec = np.concatenate([f, [float(label)]]).astype(np.float32)
                np.save(os.path.join(out_cls, stem + ".npy"), rec)
                written += 1
    return written
