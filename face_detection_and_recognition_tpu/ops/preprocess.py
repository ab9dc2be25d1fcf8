"""Fused image preprocessing: one jitted op per model family.

Replaces the reference's scattered cv2 preprocessing — ``blobFromImage`` with
BGR mean subtraction (``modules/opencv2_dnn/model.py:30-32``), yolov5's
BGR->RGB + letterbox + /255 (``modules/yolov5_face/onnx/onnx_utils.py:9-22``),
blazeface's x/127.5-1 (``modules/blazeface/blazeface.py:248-250``), facenet's
prewhitening — with a single declarative ``PreprocessSpec`` executed as fused
XLA elementwise ops on device. Layout is NHWC (TPU-native), not NCHW.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .geometry import (GRAY_FILL, _resample_axis, letterbox_params,
                       pad_resize_image, resize_bilinear, standardize_image)


@dataclasses.dataclass(frozen=True)
class PreprocessSpec:
    """Declarative preprocessing recipe.

    Attributes:
        size: model input (width, height); None keeps the input resolution.
        resize: "letterbox" (aspect-preserving pad), "stretch", or "none".
        bgr_to_rgb: swap channel order before normalization.
        scale: multiplicative factor applied after mean subtraction.
        mean: per-channel mean subtracted (in the post-swap channel order).
        std: per-channel divisor (after scale), or None.
        standardize: apply per-image prewhitening instead of mean/scale.
        fill: letterbox fill color (pre-swap order, like the reference's BGR).
    """

    size: Optional[Tuple[int, int]] = None
    resize: str = "letterbox"
    bgr_to_rgb: bool = False
    scale: float = 1.0
    mean: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    std: Optional[Tuple[float, float, float]] = None
    standardize: bool = False
    fill: Tuple[float, float, float] = GRAY_FILL


# Recipes matching each reference backend:
YOLOV5_FACE = PreprocessSpec(size=(640, 640), bgr_to_rgb=True, scale=1 / 255.0)
BLAZEFACE_FRONT = PreprocessSpec(
    size=(128, 128), bgr_to_rgb=True, scale=1 / 127.5, mean=(127.5, 127.5, 127.5)
)
BLAZEFACE_BACK = dataclasses.replace(BLAZEFACE_FRONT, size=(256, 256))
OPENCV_SSD = PreprocessSpec(size=(300, 300), mean=(104.0, 117.0, 123.0))
AGE_GENDER = PreprocessSpec(
    size=(227, 227),
    resize="stretch",
    mean=(78.4263377603, 87.7689143744, 114.895847746),
)
MOBILE_FACENET = PreprocessSpec(
    size=(112, 112), resize="stretch", scale=1 / 127.5, mean=(127.5, 127.5, 127.5)
)
FACENET = PreprocessSpec(size=(160, 160), resize="stretch", standardize=True)


@partial(jax.jit, static_argnames=("spec", "dtype"))
def apply_preprocess(img: jnp.ndarray, spec: PreprocessSpec,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Preprocess one [H, W, 3] BGR image into a model-ready [h, w, 3]
    tensor in ``dtype`` (pass bf16 when feeding a bf16 backbone: halves the
    resize/normalize bandwidth, which is ~25% of the detect step).

    Letterbox strategy (chosen by measured in-pipeline A/B on v5e, yolov5s
    b128): when the pad bands are a small fraction of the canvas (rect
    letterbox: 6% of rows) they ride THROUGH the resample matrices as zero
    rows/columns (``_resample_axis(pad=...)``) and the fill constant is one
    fused ``where`` — no separate canvas pass (-0.5 ms/step). When the pad
    fraction is large (square 640 canvas on wide video: 44% of rows) the
    zero bands would inflate the H-pass intermediate and the W-GEMM by the
    same fraction, costing more than the canvas pass saves — so the resize
    stays interior-sized and pads via dynamic_update_slice. Interior pixels
    are bitwise identical either way (zero taps contribute exact 0.0); the
    uint8 cast always fuses into the first GEMM's operands (never its own
    pass).
    """

    def _normalize(x):
        if spec.bgr_to_rgb:
            x = x[..., ::-1]
        if spec.standardize:
            return standardize_image(x.astype(jnp.float32))
        x = (x - jnp.asarray(spec.mean, dtype)) * jnp.asarray(spec.scale, dtype)
        if spec.std is not None:
            x = x / jnp.asarray(spec.std, dtype)
        return x

    if spec.size is not None and spec.resize == "letterbox":
        w, h = spec.size
        if spec.standardize:
            # per-image stats must cover the whole padded canvas: keep the
            # pad-then-normalize order (no current spec hits this path)
            x = pad_resize_image(img.astype(dtype), (w, h), color=spec.fill,
                                 dtype=dtype)
            return _normalize(x)
        in_h, in_w = img.shape[:2]
        _, sc_h, sc_w, top, left = letterbox_params((in_h, in_w), (h, w))
        fill = jnp.asarray(spec.fill, dtype)
        fill_t = _normalize(fill[None, None, :])[0, 0]
        if h * w <= 1.25 * sc_h * sc_w:
            x = _resample_axis(img, sc_h, img.ndim - 3, dtype,
                               pad=(top, h - top - sc_h))
            x = _resample_axis(x, sc_w, x.ndim - 2, dtype,
                               pad=(left, w - left - sc_w))
            x = _normalize(x)
            row = jnp.arange(h)[:, None, None]
            col = jnp.arange(w)[None, :, None]
            band = (row < top) | (row >= top + sc_h) | \
                   (col < left) | (col >= left + sc_w)
            return jnp.where(band, fill_t.astype(x.dtype), x)
        x = _normalize(resize_bilinear(img, (sc_h, sc_w), dtype=dtype))
        canvas = jnp.broadcast_to(fill_t.astype(x.dtype), (h, w, 3))
        return jax.lax.dynamic_update_slice(canvas, x, (top, left, 0))
    if spec.size is not None and spec.resize == "stretch" \
            and img.shape[:2] != (spec.size[1], spec.size[0]):
        x = resize_bilinear(img, (spec.size[1], spec.size[0]), dtype=dtype)
    else:
        x = img.astype(dtype)
    return _normalize(x)


def apply_preprocess_batch(imgs: jnp.ndarray, spec: PreprocessSpec,
                           dtype=jnp.float32) -> jnp.ndarray:
    """Preprocess [B, H, W, 3] same-sized BGR images -> [B, h, w, 3]."""
    return jax.vmap(lambda im: apply_preprocess(im, spec, dtype))(imgs)
