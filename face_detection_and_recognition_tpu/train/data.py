"""Training data pipeline: WIDER-format annotations -> padded device batches.

Builds on the eval parser (eval/coco_eval.parse_wider_annotations) and the
host decode pool: images are letterboxed to the train resolution, GT boxes
transformed with the same geometry, and padded to ``max_targets`` rows
[cx, cy, w, h, lmk x10] (landmarks -1 = invisible) for train/detection.py.
"""
from __future__ import annotations

import os
import random
from typing import Iterator, List, Tuple

import cv2
import numpy as np

from ..eval.coco_eval import parse_wider_annotations
from ..ops.geometry import letterbox_params


def load_wider_index(ann_file: str, images_root: str) -> List[Tuple[str, np.ndarray]]:
    gt = parse_wider_annotations(ann_file)
    return [(os.path.join(images_root, rel), boxes) for rel, boxes in
            sorted(gt.items())]


def make_example(
    img: np.ndarray, boxes_xywh: np.ndarray, out_wh: Tuple[int, int],
    max_targets: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Letterbox image + transform GT to padded target rows.

    Returns (image [h,w,3] f32 RGB in [0,1], targets [T,14], valid [T])."""
    h, w = img.shape[:2]
    ow, oh = out_wh
    scale, sh, sw, top, left = letterbox_params((h, w), (oh, ow))
    resized = cv2.resize(img, (sw, sh))
    canvas = np.full((oh, ow, 3), 125, np.uint8)
    canvas[top:top + sh, left:left + sw] = resized
    x = canvas[..., ::-1].astype(np.float32) / 255.0

    t = np.zeros((max_targets, 14), np.float32)
    t[:, 4:] = -1.0
    v = np.zeros((max_targets,), bool)
    n = min(len(boxes_xywh), max_targets)
    for i in range(n):
        bx, by, bw, bh = boxes_xywh[i][:4]
        cx = (bx + bw / 2.0) * scale + left
        cy = (by + bh / 2.0) * scale + top
        t[i, :4] = [cx, cy, bw * scale, bh * scale]
        v[i] = bw * scale >= 2 and bh * scale >= 2
    return x, t, v


def wider_batches(
    index: List[Tuple[str, np.ndarray]],
    batch_size: int,
    out_wh: Tuple[int, int],
    max_targets: int,
    shuffle: bool = True,
    seed: int = 0,
    epochs: int = 1,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (images [B,h,w,3], targets [B,T,14], valid [B,T])."""
    rng = random.Random(seed)
    for _ in range(epochs):
        order = list(range(len(index)))
        if shuffle:
            rng.shuffle(order)
        batch_x, batch_t, batch_v = [], [], []
        for i in order:
            path, boxes = index[i]
            img = cv2.imread(path)
            if img is None:
                continue
            x, t, v = make_example(img, boxes, out_wh, max_targets)
            batch_x.append(x)
            batch_t.append(t)
            batch_v.append(v)
            if len(batch_x) == batch_size:
                yield (np.stack(batch_x), np.stack(batch_t), np.stack(batch_v))
                batch_x, batch_t, batch_v = [], [], []
