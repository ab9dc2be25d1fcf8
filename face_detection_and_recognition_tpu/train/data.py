"""Training data pipeline: WIDER-format annotations -> padded device batches.

Builds on the eval parser (eval/coco_eval.parse_wider_annotations) and the
host decode pool: images are letterboxed to the train resolution, GT boxes
transformed with the same geometry, and padded to ``max_targets`` rows
[cx, cy, w, h, lmk x10] (landmarks -1 = invisible) for train/detection.py.

Augmentation follows the reference training recipe
(``pytorch/utils/face_datasets.py``): 4-image mosaic, HSV jitter, and
horizontal flip with landmark x-mirroring PLUS the left/right eye and mouth
index swap (face_datasets.py:419-442) — a mirrored left eye IS a right eye.
All randomness flows through an explicit ``random.Random`` for determinism.
"""
from __future__ import annotations

import dataclasses
import os
import random
from typing import Iterator, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ..eval.coco_eval import parse_wider_annotations
from ..ops.geometry import letterbox_params


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Train-time augmentation knobs (reference hyp.scratch defaults)."""
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    fliplr: float = 0.5
    flipud: float = 0.0
    mosaic: float = 1.0
    scale: float = 0.5        # mosaic per-tile scale jitter: U(1-s, 1+s)
    min_box: float = 2.0      # drop GT smaller than this many pixels post-aug


def augment_hsv(img_bgr: np.ndarray, rng: random.Random,
                hgain: float, sgain: float, vgain: float) -> np.ndarray:
    """Random HSV jitter on a uint8 BGR image (face_datasets.augment_hsv):
    per-channel LUT with gains U(-g, g)+1 applied in HSV space."""
    if hgain == sgain == vgain == 0.0:
        return img_bgr
    r = np.array([rng.uniform(-1, 1) for _ in range(3)]) \
        * np.array([hgain, sgain, vgain]) + 1.0
    hue, sat, val = cv2.split(cv2.cvtColor(img_bgr, cv2.COLOR_BGR2HSV))
    x = np.arange(256, dtype=np.int16)
    lut_hue = ((x * r[0]) % 180).astype(np.uint8)
    lut_sat = np.clip(x * r[1], 0, 255).astype(np.uint8)
    lut_val = np.clip(x * r[2], 0, 255).astype(np.uint8)
    img_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat),
                         cv2.LUT(val, lut_val)))
    return cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR)


# landmark column pairs to swap on horizontal flip: (left eye <-> right eye),
# (left mouth corner <-> right mouth corner); columns are into the 10-wide
# lmk block [x1,y1..x5,y5] of a [cx,cy,w,h,lmk x10] target row.
_LR_SWAP = [((0, 1), (2, 3)), ((6, 7), (8, 9))]


def flip_lr_targets(rows: np.ndarray, img_w: float) -> np.ndarray:
    """Mirror target rows for a horizontal image flip.

    cx -> W-cx; visible landmark x -> W-x (invisible -1 preserved); then the
    left/right eye and left/right mouth-corner landmarks exchange slots."""
    out = rows.copy()
    out[:, 0] = img_w - rows[:, 0]
    lmk = out[:, 4:14]
    xs = lmk[:, 0::2]
    lmk[:, 0::2] = np.where(xs < 0, -1.0, img_w - xs)
    for (a, b) in _LR_SWAP:
        tmp = lmk[:, [a[0], a[1]]].copy()
        lmk[:, [a[0], a[1]]] = lmk[:, [b[0], b[1]]]
        lmk[:, [b[0], b[1]]] = tmp
    out[:, 4:14] = lmk
    return out


def flip_ud_targets(rows: np.ndarray, img_h: float) -> np.ndarray:
    """Mirror target rows for a vertical flip (no index swap: up/down
    mirroring does not exchange left/right semantics)."""
    out = rows.copy()
    out[:, 1] = img_h - rows[:, 1]
    lmk = out[:, 4:14]
    ys = lmk[:, 1::2]
    lmk[:, 1::2] = np.where(ys < 0, -1.0, img_h - ys)
    out[:, 4:14] = lmk
    return out


def mosaic4(
    items: Sequence[Tuple[np.ndarray, np.ndarray]],
    out_wh: Tuple[int, int],
    rng: random.Random,
    scale: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """4-image mosaic (face_datasets.load_mosaic_face redesigned): paste 4
    scaled images quadrant-wise around a random center on a 2x canvas, then
    crop the central out_wh window.

    items: 4 of (img BGR u8, rows [N,14] pixel-coord targets).
    Returns (canvas [oh,ow,3] u8, rows [M,14]) with off-canvas GT dropped."""
    ow, oh = out_wh
    # fill with the INFERENCE letterbox gray (125, ops/geometry.GRAY_FILL),
    # not upstream yolov5's 114: mosaic-heavy training otherwise ties
    # objectness to a pad shade eval frames never show (train/serve skew on
    # the small golden composite sets)
    canvas = np.full((oh * 2, ow * 2, 3), 125, np.uint8)
    # mosaic center inside the middle half of the 2x canvas
    xc = int(rng.uniform(ow * 0.5, ow * 1.5))
    yc = int(rng.uniform(oh * 0.5, oh * 1.5))
    all_rows = []
    for i, (img, rows) in enumerate(items):
        h, w = img.shape[:2]
        s = min(ow / w, oh / h) * rng.uniform(1.0 - scale, 1.0 + scale)
        sw, sh = max(int(w * s), 1), max(int(h * s), 1)
        img = cv2.resize(img, (sw, sh))
        if i == 0:    # top-left of center
            x1, y1 = max(xc - sw, 0), max(yc - sh, 0)
            x2, y2 = xc, yc
            sx1, sy1 = sw - (x2 - x1), sh - (y2 - y1)
        elif i == 1:  # top-right
            x1, y1 = xc, max(yc - sh, 0)
            x2, y2 = min(xc + sw, ow * 2), yc
            sx1, sy1 = 0, sh - (y2 - y1)
        elif i == 2:  # bottom-left
            x1, y1 = max(xc - sw, 0), yc
            x2, y2 = xc, min(yc + sh, oh * 2)
            sx1, sy1 = sw - (x2 - x1), 0
        else:         # bottom-right
            x1, y1 = xc, yc
            x2, y2 = min(xc + sw, ow * 2), min(yc + sh, oh * 2)
            sx1, sy1 = 0, 0
        canvas[y1:y2, x1:x2] = img[sy1:sy1 + (y2 - y1), sx1:sx1 + (x2 - x1)]
        if len(rows):
            r = rows.astype(np.float32).copy()
            dx, dy = x1 - sx1, y1 - sy1
            r[:, 0] = r[:, 0] * s + dx
            r[:, 1] = r[:, 1] * s + dy
            r[:, 2:4] *= s
            lmk = r[:, 4:14]
            vis = lmk >= 0
            lmk[:, 0::2] = np.where(vis[:, 0::2], lmk[:, 0::2] * s + dx, -1.0)
            lmk[:, 1::2] = np.where(vis[:, 1::2], lmk[:, 1::2] * s + dy, -1.0)
            r[:, 4:14] = lmk
            all_rows.append(r)
    rows = (np.concatenate(all_rows, axis=0) if all_rows
            else np.zeros((0, 14), np.float32))
    # central crop back to out_wh
    cx0, cy0 = ow // 2, oh // 2
    out = canvas[cy0:cy0 + oh, cx0:cx0 + ow]
    if len(rows):
        rows[:, 0] -= cx0
        rows[:, 1] -= cy0
        lmk = rows[:, 4:14]
        vis = lmk >= 0
        lmk[:, 0::2] = np.where(vis[:, 0::2], lmk[:, 0::2] - cx0, -1.0)
        lmk[:, 1::2] = np.where(vis[:, 1::2], lmk[:, 1::2] - cy0, -1.0)
        rows[:, 4:14] = lmk
        # clip boxes to the crop, drop those mostly outside
        half_w, half_h = rows[:, 2] / 2, rows[:, 3] / 2
        bx1 = np.clip(rows[:, 0] - half_w, 0, ow)
        by1 = np.clip(rows[:, 1] - half_h, 0, oh)
        bx2 = np.clip(rows[:, 0] + half_w, 0, ow)
        by2 = np.clip(rows[:, 1] + half_h, 0, oh)
        nw, nh = bx2 - bx1, by2 - by1
        keep = (nw > 2) & (nh > 2) & (nw * nh > 0.2 * rows[:, 2] * rows[:, 3])
        boxes = np.stack([(bx1 + bx2) / 2, (by1 + by2) / 2, nw, nh], axis=1)
        # landmarks survive only if still inside the crop; else invisible
        lmk = rows[:, 4:14]
        inside_x = (lmk[:, 0::2] >= 0) & (lmk[:, 0::2] < ow)
        inside_y = (lmk[:, 1::2] >= 0) & (lmk[:, 1::2] < oh)
        inside = inside_x & inside_y
        lmk[:, 0::2] = np.where(inside, lmk[:, 0::2], -1.0)
        lmk[:, 1::2] = np.where(inside, lmk[:, 1::2], -1.0)
        rows = np.concatenate([boxes, lmk], axis=1)[keep]
    return out, rows.astype(np.float32)


def load_wider_index(ann_file: str, images_root: str) -> List[Tuple[str, np.ndarray]]:
    gt = parse_wider_annotations(ann_file)
    return [(os.path.join(images_root, rel), boxes) for rel, boxes in
            sorted(gt.items())]


def boxes_to_rows(boxes_xywh: np.ndarray) -> np.ndarray:
    """[N,4] or [N,14+] xywh GT -> [N,14] pixel rows [cx,cy,w,h,lmk x10]
    (landmark columns pass through if present, else -1)."""
    n = len(boxes_xywh)
    rows = np.full((n, 14), -1.0, np.float32)
    if n:
        b = np.asarray(boxes_xywh, np.float32)
        rows[:, 0] = b[:, 0] + b[:, 2] / 2.0
        rows[:, 1] = b[:, 1] + b[:, 3] / 2.0
        rows[:, 2:4] = b[:, 2:4]
        if b.shape[1] >= 14:
            rows[:, 4:14] = b[:, 4:14]
    return rows


def letterbox_example(
    img: np.ndarray, rows: np.ndarray, out_wh: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Letterbox a BGR u8 image + transform pixel target rows to match.

    Returns (canvas [oh,ow,3] u8, rows [N,14] in canvas pixels)."""
    h, w = img.shape[:2]
    ow, oh = out_wh
    scale, sh, sw, top, left = letterbox_params((h, w), (oh, ow))
    resized = cv2.resize(img, (sw, sh))
    canvas = np.full((oh, ow, 3), 125, np.uint8)
    canvas[top:top + sh, left:left + sw] = resized
    out = rows.astype(np.float32).copy()
    if len(out):
        out[:, 0] = out[:, 0] * scale + left
        out[:, 1] = out[:, 1] * scale + top
        out[:, 2:4] *= scale
        lmk = out[:, 4:14]
        vis = lmk >= 0
        lmk[:, 0::2] = np.where(vis[:, 0::2], lmk[:, 0::2] * scale + left, -1.0)
        lmk[:, 1::2] = np.where(vis[:, 1::2], lmk[:, 1::2] * scale + top, -1.0)
        out[:, 4:14] = lmk
    return canvas, out


def rows_to_padded(
    rows: np.ndarray, max_targets: int, min_box: float = 2.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad [N,14] rows to ([T,14], valid [T]); tiny boxes are padded in but
    marked invalid (matching the reference's min-size filter)."""
    t = np.zeros((max_targets, 14), np.float32)
    t[:, 4:] = -1.0
    v = np.zeros((max_targets,), bool)
    n = min(len(rows), max_targets)
    if n:
        t[:n] = rows[:n]
        v[:n] = (rows[:n, 2] >= min_box) & (rows[:n, 3] >= min_box)
    return t, v


def make_example(
    img: np.ndarray, boxes_xywh: np.ndarray, out_wh: Tuple[int, int],
    max_targets: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Letterbox image + transform GT to padded target rows.

    Returns (image [h,w,3] f32 RGB in [0,1], targets [T,14], valid [T])."""
    canvas, rows = letterbox_example(img, boxes_to_rows(boxes_xywh), out_wh)
    x = canvas[..., ::-1].astype(np.float32) / 255.0
    t, v = rows_to_padded(rows, max_targets)
    return x, t, v


def augment_example(
    canvas: np.ndarray, rows: np.ndarray, rng: random.Random,
    aug: AugmentConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """HSV + flips on a composed (canvas u8 BGR, pixel rows) example."""
    oh, ow = canvas.shape[:2]
    canvas = augment_hsv(canvas, rng, aug.hsv_h, aug.hsv_s, aug.hsv_v)
    if rng.random() < aug.flipud:
        canvas = np.flipud(canvas)
        rows = flip_ud_targets(rows, float(oh))
    if rng.random() < aug.fliplr:
        canvas = np.fliplr(canvas)
        rows = flip_lr_targets(rows, float(ow))
    return np.ascontiguousarray(canvas), rows


def prefetch_iter(it: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator in a daemon thread feeding a bounded queue, so host
    batch assembly overlaps the device step + host->device upload (both
    release the GIL). Exceptions from the source re-raise at the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    end = object()

    def run():
        try:
            for x in it:
                q.put(x)
            q.put(end)
        except BaseException as e:  # noqa: BLE001 - propagate to consumer
            q.put(e)

    threading.Thread(target=run, daemon=True).start()
    while True:
        got = q.get()
        if got is end:
            return
        if isinstance(got, BaseException):
            raise got
        yield got


def wider_batches(
    index: List[Tuple[str, np.ndarray]],
    batch_size: int,
    out_wh: Tuple[int, int],
    max_targets: int,
    shuffle: bool = True,
    seed: int = 0,
    epochs: int = 1,
    augment: Optional[AugmentConfig] = None,
    as_uint8: bool = False,
    cache_mb: float = 0.0,
    to_rgb: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield (images [B,h,w,3], targets [B,T,14], valid [B,T]).

    ``to_rgb=False`` keeps the decoded BGR channel order (the OpenCV-SSD
    training convention; yolo-family trainers take RGB).

    With ``augment`` set, each example goes through mosaic (probability
    ``augment.mosaic``, pulling 3 extra random images), HSV jitter, and
    flips with the landmark left/right swap.

    ``as_uint8=True`` yields RGB uint8 images (the train step normalizes on
    device; 4x less host->device traffic than f32 in [0,1]).

    ``cache_mb`` bounds an in-memory decoded-image cache: with mosaic every
    example pulls 3 extra random images, so on small datasets JPEG decode
    dominates batch assembly; caching removes it. 0 disables."""
    rng = random.Random(seed)
    cache: dict = {}
    cache_bytes = [0]
    budget = int(cache_mb * 1e6)

    def load(i):
        img = cache.get(i)
        if img is None:
            img = cv2.imread(index[i][0])
            if img is not None and cache_bytes[0] + img.nbytes <= budget:
                cache[i] = img
                cache_bytes[0] += img.nbytes
        if img is None:
            return None
        # fresh rows per call: downstream transforms own their copy, the
        # cached pixels are never written through
        return img, boxes_to_rows(index[i][1])

    # batch accumulators live OUTSIDE the epoch loop so a batch can span an
    # epoch boundary — otherwise batch_size > len(index) never yields
    batch_x, batch_t, batch_v = [], [], []
    for _ in range(epochs):
        order = list(range(len(index)))
        if shuffle:
            rng.shuffle(order)
        for i in order:
            item = load(i)
            if item is None:
                continue
            if augment is not None and rng.random() < augment.mosaic:
                extra = [load(rng.randrange(len(index))) for _ in range(3)]
                items = [item] + [e for e in extra if e is not None]
                while len(items) < 4:
                    items.append(items[rng.randrange(len(items))])
                canvas, rows = mosaic4(items, out_wh, rng, augment.scale)
            else:
                canvas, rows = letterbox_example(item[0], item[1], out_wh)
            if augment is not None:
                canvas, rows = augment_example(canvas, rows, rng, augment)
            out = np.ascontiguousarray(canvas[..., ::-1]) if to_rgb else canvas
            x = out if as_uint8 else out.astype(np.float32) / 255.0
            t, v = rows_to_padded(
                rows, max_targets,
                augment.min_box if augment is not None else 2.0)
            batch_x.append(x)
            batch_t.append(t)
            batch_v.append(v)
            if len(batch_x) == batch_size:
                yield (np.stack(batch_x), np.stack(batch_t), np.stack(batch_v))
                batch_x, batch_t, batch_v = [], [], []
