"""Box arithmetic: format conversion and batched IoU.

The reference computes IoU in three slightly different conventions
(scalar IoU at ``modules/utils/image.py:124-143``; +1-pixel IoU at
``modules/yolov5_face/onnx/onnx_utils.py:76-104``; jaccard matrix at
``modules/blazeface/blazeface.py:463-518``). Here each is a vectorized
matrix op so NMS can consume a full KxK IoU matrix computed on the VPU/MXU
instead of per-box python loops.
"""
from __future__ import annotations

import jax.numpy as jnp


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] center-size -> corner format (``onnx_utils.py:302-310``)."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] corner -> center-size format (``onnx_utils.py:291-299``)."""
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(boxes: jnp.ndarray, plus1: bool = False) -> jnp.ndarray:
    """Area of [..., 4] xyxy boxes; ``plus1`` adds the legacy +1px convention."""
    off = 1.0 if plus1 else 0.0
    return (boxes[..., 2] - boxes[..., 0] + off) * (boxes[..., 3] - boxes[..., 1] + off)


def iou_matrix(
    a: jnp.ndarray, b: jnp.ndarray, plus1: bool = False, eps: float = 0.0
) -> jnp.ndarray:
    """Pairwise IoU between xyxy boxes a [..., N, 4] and b [..., M, 4] -> [..., N, M].

    plus1=True reproduces the yolov5-face custom NMS convention where
    intersections and areas get a +1 pixel offset (``onnx_utils.py:96-100``);
    its eps is 1e-16. plus1=False is the standard jaccard used by blazeface
    and torchvision (``blazeface.py:494-518``).
    """
    off = 1.0 if plus1 else 0.0
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:4], b[..., None, :, 2:4])
    wh = jnp.clip(rb - lt + off, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a, plus1)[..., :, None] + box_area(b, plus1)[..., None, :] - inter
    return inter / (union + eps) if eps else inter / union


def iou_single(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """Scalar IoU between two xyxy boxes with the reference's exact
    no-intersection semantics (``image.py:124-143``): returns 0 when either
    axis overlap is strictly negative (touching boxes count as intersecting
    with zero area but are still multiplied out)."""
    x_diff = jnp.minimum(box1[2], box2[2]) - jnp.maximum(box1[0], box2[0])
    y_diff = jnp.minimum(box1[3], box2[3]) - jnp.maximum(box1[1], box2[1])
    inter = x_diff * y_diff
    union = (
        (box1[2] - box1[0]) * (box1[3] - box1[1])
        + (box2[2] - box2[0]) * (box2[3] - box2[1])
        - inter
    )
    iou = inter / union
    return jnp.where((x_diff < 0) | (y_diff < 0), 0.0, iou)
