"""Geometry kernels: letterbox resize, coordinate rescaling, standardization.

TPU-native equivalents of the reference's cv2-based helpers
(``modules/utils/image.py:12-118`` in SamSamhuns/face_detection_and_recognition).
Everything here is a pure function of statically-shaped arrays, so each unique
input resolution traces once and then runs fused on device. Bilinear resampling
matches cv2.resize(INTER_LINEAR) semantics (half-pixel centers, no antialias).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Color = Tuple[float, float, float]

GRAY_FILL: Color = (125.0, 125.0, 125.0)  # reference letterbox fill (BGR)


def make_divisible(x: int, divisor: int) -> int:
    """Round ``x`` up to the nearest multiple of ``divisor``.

    Mirrors ``modules/utils/image.py:12-16``.
    """
    return int(math.ceil(x / divisor) * divisor)


def check_img_size(img_size: int, s: int = 32) -> int:
    """Verify img_size is a multiple of stride ``s`` (``image.py:19-28``)."""
    return make_divisible(img_size, int(s))


def letterbox_params(
    in_hw: Tuple[int, int], out_hw: Tuple[int, int]
) -> Tuple[float, int, int, int, int]:
    """Static letterbox geometry: returns (scale, new_h, new_w, pad_top, pad_left).

    Matches the rounding of ``pad_resize_image`` (``image.py:31-59``):
    scaled dims use int() truncation, padding splits with floor on the
    top/left side.
    """
    in_h, in_w = in_hw
    out_h, out_w = out_hw
    scale = min(out_w / in_w, out_h / in_h)
    new_w, new_h = int(in_w * scale), int(in_h * scale)
    d_w, d_h = max(out_w - new_w, 0), max(out_h - new_h, 0)
    return scale, new_h, new_w, d_h // 2, d_w // 2


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int],
                    dtype=jnp.float32) -> jnp.ndarray:
    """Bilinear resize with cv2.INTER_LINEAR semantics (no antialiasing).

    img: [..., H, W, C] float or uint8; returns ``dtype`` (bf16 halves the
    resize bandwidth on TPU when feeding a bf16 backbone).
    """
    *lead, h, w, c = img.shape
    out_shape = (*lead, out_hw[0], out_hw[1], c)
    return jax.image.resize(
        img.astype(dtype), out_shape, method="linear", antialias=False
    )


@partial(jax.jit, static_argnames=("new_size", "color", "dtype"))
def pad_resize_image(
    img: jnp.ndarray,
    new_size: Tuple[int, int],
    color: Color = GRAY_FILL,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Letterbox: resize keeping aspect then center-pad with ``color``.

    Equivalent to ``pad_resize_image`` (``image.py:31-59``) but jitted.
    Args:
        img: [H, W, C] image (BGR uint8/float).
        new_size: (width, height) — note the reference's (w, h) convention.
    Returns float32 [new_h, new_w, C].
    """
    in_h, in_w = img.shape[:2]
    new_w, new_h = new_size
    _, sc_h, sc_w, top, left = letterbox_params((in_h, in_w), (new_h, new_w))
    resized = resize_bilinear(img, (sc_h, sc_w), dtype=dtype)
    canvas = jnp.empty((new_h, new_w, img.shape[2]), dtype)
    canvas = canvas.at[:].set(jnp.asarray(color, dtype))
    return jax.lax.dynamic_update_slice(canvas, resized, (top, left, 0))


def batched_pad_resize(
    imgs: jnp.ndarray, new_size: Tuple[int, int], color: Color = GRAY_FILL
) -> jnp.ndarray:
    """vmapped letterbox over a batch of same-sized images [B,H,W,C]."""
    return jax.vmap(lambda im: pad_resize_image(im, new_size, color))(imgs)


def host_letterbox(img, out_hw: Tuple[int, int],
                   fill: Color = GRAY_FILL):
    """Numpy/cv2 letterbox with the SAME geometry as pad_resize_image
    (letterbox_params is the shared source of truth) — for host-side block
    builders (batched WIDER eval, imdb-wiki) that letterbox before upload."""
    import cv2
    import numpy as np

    out_h, out_w = out_hw
    ih, iw = img.shape[:2]
    _, sh, sw, top, left = letterbox_params((ih, iw), (out_h, out_w))
    canvas = np.full((out_h, out_w, 3), np.asarray(fill, np.uint8), np.uint8)
    canvas[top:top + sh, left:left + sw] = cv2.resize(img, (sw, sh))
    return canvas


def clip_coords(boxes: jnp.ndarray, img_hw: Tuple[int, int]) -> jnp.ndarray:
    """Clip the 4 box coords to image bounds (``image.py:62-76``).

    Functional (returns a new array) rather than in-place. Like the
    reference, ONLY columns 0-3 (xyxy) are clipped — landmark columns pass
    through unclipped.
    """
    h, w = img_hw
    d = boxes.shape[-1]
    lim = jnp.asarray(
        [w if i % 2 == 0 else h for i in range(min(d, 4))]
        + [jnp.inf] * max(d - 4, 0),
        jnp.float32,
    )
    lo = jnp.asarray([0.0] * min(d, 4) + [-jnp.inf] * max(d - 4, 0),
                     jnp.float32)
    return jnp.clip(boxes, lo.astype(boxes.dtype), lim.astype(boxes.dtype))


def scale_coords(
    model_hw: Tuple[int, int],
    coords: jnp.ndarray,
    orig_hw: Tuple[int, int],
    ratio_pad=None,
) -> jnp.ndarray:
    """Rescale xyxy(+landmarks) coords from letterboxed model space to the
    original image, undoing padding (``image.py:79-99``).

    coords: [..., D] with alternating x/y columns.
    """
    if ratio_pad is None:
        gain = min(model_hw[0] / orig_hw[0], model_hw[1] / orig_hw[1])
        pad = (
            (model_hw[1] - orig_hw[1] * gain) / 2,
            (model_hw[0] - orig_hw[0] * gain) / 2,
        )
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    d = coords.shape[-1]
    shift = jnp.asarray(
        [pad[0] if i % 2 == 0 else pad[1] for i in range(d)], coords.dtype
    )
    out = (coords - shift) / gain
    return clip_coords(out, orig_hw)


def standardize_image(img: jnp.ndarray) -> jnp.ndarray:
    """Per-image standardization ("prewhiten", ``image.py:102-118``).

    Works on [H,W,C] or [B,H,W,C]; stats are taken per image over all pixels
    with std_adj = max(std, 1/sqrt(n_elements)).
    """
    img = img.astype(jnp.float32)
    if img.ndim == 4:
        axis: Sequence[int] = (1, 2, 3)
        size = img.shape[1] * img.shape[2] * img.shape[3]
    elif img.ndim == 3:
        axis = (0, 1, 2)
        size = img.size
    else:
        raise ValueError("Dimension should be 3 or 4")
    mean = jnp.mean(img, axis=axis, keepdims=True)
    std = jnp.std(img, axis=axis, keepdims=True)
    std_adj = jnp.maximum(std, 1.0 / math.sqrt(size))
    return (img - mean) / std_adj
