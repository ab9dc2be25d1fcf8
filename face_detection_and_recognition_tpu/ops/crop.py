"""Batched face crop + resize on device.

Replaces the reference's per-box python crops + cv2.resize calls
(``face_extraction/extract_faces_from_dataset.py:290-303``: crop offsets
(-6, -1, +4, +5); ``modules/opencv2_dnn/model.py:148-152``: +-5px padding for
the age/gender cascade; Triton server-side 112x112 crop,
``face_detection_trt_server/models/yolov5_face_postprocess/1/model.py``).

A bilinear sampler produces a fixed [K, h, w, C] stack of crops for ALL
detections of an image in one op — no host round-trip between detector and
embedder. Sampling uses half-pixel centers, matching
cv2.resize(INTER_LINEAR) applied to the integer-cropped region.

Two equivalent implementations, selected by ``method``:
  * "gather" — per-crop two-stage row/column gathers; best on CPU.
  * "gemm"  — separable interpolation as two dense matmuls per crop
    (rows = Wy @ img, out = rows @ Wx^T with bilinear hat-function weight
    matrices built from iota). TPU gathers run ~10-80x off speed of light,
    so on TPU this rides the MXU instead: measured 3-7x faster at MTCNN
    cascade shapes (B16 x K256 @ 576x1024: 21ms vs 59ms at 24x24, 27ms vs
    177ms at 48x48).
  * "pallas" — the same separable GEMMs as ONE Pallas kernel
    (ops/pallas_kernels.crop_gemm_pallas): the image loads into VMEM once
    for all K crops and the per-crop row strip never hits HBM. Another
    2.4x over "gemm" (8.8ms at the 24x24 shape above) at MXU-bf16-pass
    accuracy (~0.6% of value range) — the default inside the MTCNN cascade
    on TPU, whose inputs are (-1, 1)-normalized.
  * "auto" (default) — gemm on TPU, gather elsewhere.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# the reference's feature-extraction crop offsets (x1, y1, x2, y2)
EXTRACTION_OFFSETS = (-6.0, -1.0, 4.0, 5.0)


def extraction_crop_region(box, w: int, h: int):
    """Integer (x1, y1, x2, y2) crop region for saved artifacts: the
    reference's offsets clipped to the frame. Slice ends are EXCLUSIVE, so
    the clip bound is w/h — not w-1/h-1, which would drop the last pixel
    column/row of edge-touching faces (extract_faces_from_dataset.py:301)."""
    x1, y1, x2, y2 = (int(v) for v in box)
    ox1, oy1, ox2, oy2 = (int(v) for v in EXTRACTION_OFFSETS)
    return (max(0, x1 + ox1), max(0, y1 + oy1),
            min(w, x2 + ox2), min(h, y2 + oy2))


def _auto_method() -> str:
    from .platform import on_tpu

    return "gemm" if on_tpu() else "gather"


def _hat_weights(coords: jnp.ndarray, n: int) -> jnp.ndarray:
    """Bilinear hat-function interpolation matrix: [K, out, n] with
    w[k, o, i] = max(0, 1 - |coords[k, o] - i|). Rows sum to 1 for in-bounds
    coords and to 0 for coords entirely outside [0, n-1] +- 1 (zero-pad)."""
    i = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - i))


def _crop_gemm(img, ys, xs, valid):
    """Separable bilinear sampling as two matmuls. img [H, W, C] f32;
    ys [K, oh] / xs [K, ow] source coordinates (already clipped for clamp
    semantics; out-of-bounds coords contribute zero for pad semantics)."""
    h, w = img.shape[:2]
    c = img.shape[2]
    k, oh = ys.shape
    ow = xs.shape[1]
    wy = _hat_weights(ys, h)                                  # [K, oh, H]
    wx = _hat_weights(xs, w)                                  # [K, ow, W]
    rows = wy.reshape(k * oh, h) @ img.reshape(h, w * c)      # one clean GEMM
    rows = rows.reshape(k, oh, w, c).transpose(0, 1, 3, 2).reshape(k, oh * c, w)
    out = jax.lax.batch_matmul(rows, wx.transpose(0, 2, 1))   # [K, oh*C, ow]
    out = out.reshape(k, oh, c, ow).transpose(0, 1, 3, 2)
    if valid is not None:
        out = jnp.where(valid[:, None, None, None], out, 0.0)
    return out


@partial(jax.jit, static_argnames=("out_hw", "method"))
def crop_and_resize(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: Tuple[int, int],
    valid: jnp.ndarray = None,
    method: str = "auto",
) -> jnp.ndarray:
    """Crop each xyxy box from ``img`` and bilinearly resize to ``out_hw``.

    Args:
        img: [H, W, C] float or uint8.
        boxes: [K, 4] xyxy in pixels (float; clamped to image bounds; each
            box is truncated to integers first, like python slicing in the
            reference).
        out_hw: output (height, width).
        valid: optional [K] mask; invalid crops come back as zeros.
    Returns:
        [K, out_h, out_w, C] float32.
    """
    h, w = img.shape[:2]
    oh, ow = out_hw
    img = img.astype(jnp.float32)
    if method == "auto":
        method = _auto_method()

    x1 = jnp.clip(jnp.floor(boxes[:, 0]), 0, w - 1)
    y1 = jnp.clip(jnp.floor(boxes[:, 1]), 0, h - 1)
    x2 = jnp.clip(jnp.floor(boxes[:, 2]), x1 + 1, w)
    y2 = jnp.clip(jnp.floor(boxes[:, 3]), y1 + 1, h)
    cw, ch = x2 - x1, y2 - y1

    if method == "pallas":
        return _crop_pallas(img, boxes, valid, (oh, ow), clamp=True)
    if method == "gemm":
        o_y = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
        o_x = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
        ys = y1[:, None] + o_y[None, :] * ch[:, None] - 0.5
        xs = x1[:, None] + o_x[None, :] * cw[:, None] - 0.5
        ys = jnp.clip(ys, y1[:, None], (y1 + ch)[:, None] - 1)
        xs = jnp.clip(xs, x1[:, None], (x1 + cw)[:, None] - 1)
        return _crop_gemm(img, ys, xs, valid)

    def sample_one(bx1, by1, bcw, bch):
        # half-pixel-center source coords for each output pixel
        ys = by1 + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * bch / oh - 0.5
        xs = bx1 + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * bcw / ow - 0.5
        ys = jnp.clip(ys, by1, by1 + bch - 1)
        xs = jnp.clip(xs, bx1, bx1 + bcw - 1)
        y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
        y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)
        top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1i] * wx
        bot = img[y1i][:, x0] * (1 - wx) + img[y1i][:, x1i] * wx
        return top * (1 - wy) + bot * wy

    crops = jax.vmap(sample_one)(x1, y1, cw, ch)
    if valid is not None:
        crops = jnp.where(valid[:, None, None, None], crops, 0.0)
    return crops


@partial(jax.jit, static_argnames=("out_hw", "method", "compute_dtype"))
def crop_and_resize_padded(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: Tuple[int, int],
    valid: jnp.ndarray = None,
    method: str = "auto",
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Like crop_and_resize, but boxes may extend beyond the image: samples
    that fall outside are ZERO instead of clamped — matching MTCNN's ``pad``
    semantics (out-of-bounds crop regions placed into a zero canvas before
    resizing, facenet align/detect_face.py).
    """
    h, w = img.shape[:2]
    oh, ow = out_hw
    img = img.astype(jnp.float32)
    if method == "auto":
        method = _auto_method()

    x1 = jnp.floor(boxes[:, 0])
    y1 = jnp.floor(boxes[:, 1])
    cw = jnp.maximum(jnp.floor(boxes[:, 2]) - x1, 1.0)
    ch = jnp.maximum(jnp.floor(boxes[:, 3]) - y1, 1.0)

    if method == "pallas":
        return _crop_pallas(img, boxes, valid, (oh, ow), clamp=False,
                            compute_dtype=compute_dtype)
    if method == "gemm":
        # hat weights vanish outside [0, H-1]/[0, W-1]: exactly the facenet
        # zero-canvas pad semantics, no masking needed
        o_y = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / oh
        o_x = (jnp.arange(ow, dtype=jnp.float32) + 0.5) / ow
        ys = y1[:, None] + o_y[None, :] * ch[:, None] - 0.5
        xs = x1[:, None] + o_x[None, :] * cw[:, None] - 0.5
        return _crop_gemm(img, ys, xs, valid)

    def sample_one(bx1, by1, bcw, bch):
        ys = by1 + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * bch / oh - 0.5
        xs = bx1 + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * bcw / ow - 0.5
        y0f = jnp.floor(ys)
        x0f = jnp.floor(xs)
        wy = (ys - y0f)[:, None, None]
        wx = (xs - x0f)[None, :, None]

        def gather(yi, xi):
            inb = ((yi >= 0)[:, None] & (yi < h)[:, None]
                   & (xi >= 0)[None, :] & (xi < w)[None, :])
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            vals = img[yc][:, xc]
            return jnp.where(inb[..., None], vals, 0.0)

        top = gather(y0f, x0f) * (1 - wx) + gather(y0f, x0f + 1) * wx
        bot = gather(y0f + 1, x0f) * (1 - wx) + gather(y0f + 1, x0f + 1) * wx
        return top * (1 - wy) + bot * wy

    crops = jax.vmap(sample_one)(x1, y1, cw, ch)
    if valid is not None:
        crops = jnp.where(valid[:, None, None, None], crops, 0.0)
    return crops


def _crop_pallas(img, boxes, valid, out_hw, clamp, compute_dtype=jnp.float32):
    """compute_dtype=bf16 runs the crop GEMMs at full MXU rate (f32 is 1/4
    on v5e) — right when the crops feed a bf16 network anyway (the pixels
    get rounded to bf16 at its first conv regardless); keep f32 when the
    crops themselves are the product (extraction jpgs)."""
    from .pallas_kernels import crop_gemm_pallas

    oh, ow = out_hw
    h, w = img.shape[:2]
    c = img.shape[2]
    img_cm = img.transpose(2, 0, 1).reshape(c * h, w)
    v = valid if valid is not None else jnp.ones(boxes.shape[0], jnp.float32)
    out = crop_gemm_pallas(img_cm, boxes, v, (oh, ow), clamp=clamp,
                           compute_dtype=compute_dtype, channels=c)
    return out.reshape(boxes.shape[0], c, oh, ow).transpose(0, 2, 3, 1)


def pad_boxes(
    boxes: jnp.ndarray,
    offsets: Tuple[float, float, float, float],
    img_wh: Tuple[int, int] = None,
) -> jnp.ndarray:
    """Apply per-corner crop offsets (e.g. EXTRACTION_OFFSETS or the
    age/gender (-5,-5,+5,+5) padding); optionally clamp to image bounds."""
    out = boxes + jnp.asarray(offsets, boxes.dtype)
    if img_wh is not None:
        w, h = img_wh
        lim = jnp.asarray([w - 1, h - 1, w - 1, h - 1], boxes.dtype)
        out = jnp.clip(out, 0.0, lim)
    return out
