"""Drawing utilities: bbox/landmark/label rendering on cv2 images.

Same visual contract as the reference's ``draw_bbox_on_image``
(``modules/utils/image.py:146-204``): red boxes, conf_area labels with an
alpha-blended black text background, red landmark circles, and the 56-color
distinct palette (``image.py:207-230``).
"""
from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def draw_bbox_on_image(
    img: np.ndarray, post_dets, line_thickness: int = None,
    text_bg_alpha: float = 0.5,
) -> np.ndarray:
    boxes = post_dets.boxes
    confs = post_dets.bbox_confs
    areas = post_dets.bbox_areas
    lmarks = post_dets.bbox_lmarks
    labels = post_dets.bbox_labels
    h, w = img.shape[:2]
    tl = line_thickness or round(0.002 * (w + h) / 2) + 1

    for i, box in enumerate(boxes):
        label = f"{confs[i]:.2f}" if areas is None else f"{confs[i]:.2f}_{areas[i]:.2f}"
        x1, y1, x2, y2 = (int(v) for v in box[:4])
        x1, y1, x2, y2 = max(x1, 0), max(y1, 0), min(x2, w), min(y2, h)
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255),
                      thickness=max(int((w + h) / 600), 1), lineType=cv2.LINE_AA)
        if lmarks is not None and len(lmarks) and np.asarray(lmarks[i]).size:
            lm = np.asarray(lmarks[i])
            for li in range(0, lm.size - 1, 2):
                cv2.circle(img, (int(lm[li]), int(lm[li + 1])), radius=3,
                           color=(0, 0, 255), thickness=1)
        if labels:
            label += str(labels[i])
        t_size = cv2.getTextSize(label, 0, fontScale=tl / 3, thickness=1)[0]
        # alpha-blended text background
        y_min = max(0, int(y1 - t_size[1] - 3))
        x_max = min(w, int(x1 + t_size[0]))
        x_min = max(0, int(x1 - 1))
        if text_bg_alpha == 0.0:
            cv2.rectangle(img, (x1 - 1, y1), (x_max, y_min), (0, 0, 0),
                          cv2.FILLED, cv2.LINE_AA)
        else:
            roi = img[y_min:y1, x_min:x_max]
            img[y_min:y1, x_min:x_max] = (roi * text_bg_alpha).astype(img.dtype)
        cv2.putText(img, label, (x1 + 3, y1 - 4), 0, fontScale=tl / 4,
                    color=[255, 255, 255], thickness=1, lineType=cv2.LINE_AA)
    return img


_COLOR_STEPS = (255, 128, 192, 64, 32, 96, 160, 224)


def get_distinct_rgb_color(index: int) -> Tuple[int, int, int]:
    """56-color distinct palette with cycling (``image.py:207-230``):
    for each intensity step: (v,0,0),(0,v,0),(0,0,v),(v,v,0),(v,0,v),(0,v,v),
    (v,v,v) — generated rather than hand-enumerated."""
    patterns = ((1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, 0, 1),
                (0, 1, 1), (1, 1, 1))
    total = len(_COLOR_STEPS) * len(patterns)
    index %= total
    v = _COLOR_STEPS[index // len(patterns)]
    p = patterns[index % len(patterns)]
    return (v * p[0], v * p[1], v * p[2])
