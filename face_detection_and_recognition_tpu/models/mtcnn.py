"""MTCNN P/R/O-Net cascade, TPU-native.

Capability target: the reference's two MTCNN backends — the ``mtcnn`` pip
package (Keras) wrapped at ``modules/mtcnn/model.py:10-54`` and the frozen
TF graph blaueck/tf-mtcnn (``model.py:57-118``) with config min_size=40,
factor=0.7, thresholds=(0.6, 0.7, 0.8). Both implement the standard MTCNN
algorithm (Zhang et al. 2016, as in facenet/align/detect_face.py): an image
pyramid over a fully-convolutional P-Net, then R-Net / O-Net refinement with
per-stage NMS, box regression, square re-centering, and 5-point landmarks.

TPU-first reformulation (the "hard part (a)" of SURVEY.md §7 — dynamic-shape
elimination):
  * the pyramid has a STATIC number of levels per input resolution (computed
    at trace time), each level a separate resize+P-Net application;
  * every stage keeps a fixed top-K proposal block with a validity mask —
    empty levels/stages flow through as masked rows instead of ragged arrays;
  * stage NMS uses ops/nms.greedy_nms ("union" / "min" modes);
  * R/O-Net crops use the zero-pad-out-of-bounds sampler (ops/crop).

Output matches the MTCNNFastModel wrapper contract (``model.py:103-118``):
rows [xmin, ymin, xmax, ymax, lmk x/y pairs x5, conf] normalized to the
input image size.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.crop import crop_and_resize_padded
from ..ops.geometry import resize_bilinear
from ..ops.nms import greedy_nms_mask, sort_by_score
from .layers import Dtype, PReLU


@dataclasses.dataclass(frozen=True)
class MTCNNConfig:
    min_size: int = 40
    factor: float = 0.7
    thresholds: Tuple[float, float, float] = (0.6, 0.7, 0.8)
    max_per_level: int = 128
    max_stage1: int = 256
    max_stage2: int = 128
    max_faces: int = 64
    # R/O-Net crop implementation: None = auto (Pallas VMEM kernel on TPU —
    # the cascade's inputs are (-1,1) normalized so MXU-bf16-pass accuracy
    # costs <1% of value range — exact gather elsewhere)
    crop_method: str = None


def _ceil_pool(x, k, s):
    """torch/caffe ceil_mode max pool == SAME-edge-padded pool in flax."""
    h, w = x.shape[1:3]
    ph = max(0, (math.ceil((h - k) / s) * s + k) - h)
    pw = max(0, (math.ceil((w - k) / s) * s + k) - w)
    return nn.max_pool(x, (k, k), (s, s), padding=[(0, ph), (0, pw)])


class PNet(nn.Module):
    """Proposal net: fully-convolutional, stride 2, 12px receptive field."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(10, (3, 3), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        x = _ceil_pool(x, 2, 2)
        x = nn.Conv(16, (3, 3), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        x = nn.Conv(32, (3, 3), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        prob = nn.softmax(nn.Conv(2, (1, 1), dtype=self.dtype)(x), axis=-1)
        reg = nn.Conv(4, (1, 1), dtype=self.dtype)(x)
        return prob.astype(jnp.float32), reg.astype(jnp.float32)


class RNet(nn.Module):
    """Refine net: 24x24 crops -> (prob[2], reg[4])."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(28, (3, 3), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        x = _ceil_pool(x, 3, 2)
        x = nn.Conv(48, (3, 3), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        x = _ceil_pool(x, 3, 2)
        x = nn.Conv(64, (2, 2), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        x = PReLU(dtype=self.dtype)(nn.Dense(128, dtype=self.dtype)(x))
        prob = nn.softmax(nn.Dense(2, dtype=self.dtype)(x), axis=-1)
        reg = nn.Dense(4, dtype=self.dtype)(x)
        return prob.astype(jnp.float32), reg.astype(jnp.float32)


class ONet(nn.Module):
    """Output net: 48x48 crops -> (prob[2], reg[4], landmarks[10])."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(32, (3, 3), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        x = _ceil_pool(x, 3, 2)
        x = nn.Conv(64, (3, 3), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        x = _ceil_pool(x, 3, 2)
        x = nn.Conv(64, (3, 3), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        x = _ceil_pool(x, 2, 2)
        x = nn.Conv(128, (2, 2), padding="VALID", dtype=self.dtype)(x)
        x = PReLU(dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        x = PReLU(dtype=self.dtype)(nn.Dense(256, dtype=self.dtype)(x))
        prob = nn.softmax(nn.Dense(2, dtype=self.dtype)(x), axis=-1)
        reg = nn.Dense(4, dtype=self.dtype)(x)
        lmk = nn.Dense(10, dtype=self.dtype)(x)
        return prob.astype(jnp.float32), reg.astype(jnp.float32), lmk.astype(jnp.float32)


def pyramid_scales(h: int, w: int, min_size: int, factor: float):
    """Static pyramid: scale_0 = 12/min_size, multiply by factor while the
    scaled short side still fits a 12px P-Net window."""
    scales = []
    m = 12.0 / min_size
    minl = min(h, w) * m
    while minl >= 12.0:
        scales.append(m)
        m *= factor
        minl *= factor
    return scales


def _rerec(boxes: jnp.ndarray) -> jnp.ndarray:
    """Square boxes around their center (facenet rerec)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    l = jnp.maximum(w, h)
    cx = boxes[:, 0] + w * 0.5
    cy = boxes[:, 1] + h * 0.5
    return jnp.stack(
        [cx - l * 0.5, cy - l * 0.5, cx + l * 0.5, cy + l * 0.5], axis=-1
    )


def _bbreg(boxes: jnp.ndarray, reg: jnp.ndarray) -> jnp.ndarray:
    """Box regression with the classic +1 width convention (facenet bbreg)."""
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    return jnp.stack(
        [
            boxes[:, 0] + reg[:, 0] * w,
            boxes[:, 1] + reg[:, 1] * h,
            boxes[:, 2] + reg[:, 2] * w,
            boxes[:, 3] + reg[:, 3] * h,
        ],
        axis=-1,
    )


class MTCNN:
    """The full cascade. Build once per input resolution; ``detect`` is one
    jitted program over all pyramid levels + 3 stages."""

    def __init__(self, cfg: MTCNNConfig = MTCNNConfig(), rng=None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r1, r2, r3 = jax.random.split(rng, 3)
        self.pnet = PNet(dtype=dtype)
        self.rnet = RNet(dtype=dtype)
        self.onet = ONet(dtype=dtype)
        self.pnet_vars = jax.jit(self.pnet.init)(r1, jnp.zeros((1, 12, 12, 3)))
        self.rnet_vars = jax.jit(self.rnet.init)(r2, jnp.zeros((1, 24, 24, 3)))
        self.onet_vars = jax.jit(self.onet.init)(r3, jnp.zeros((1, 48, 48, 3)))
        self._detect_cache = {}

    def variables(self):
        return {"pnet": self.pnet_vars, "rnet": self.rnet_vars,
                "onet": self.onet_vars}

    def detect_fn(self, h: int, w: int):
        """Return the jitted detect(variables, img_bgr_u8 [h,w,3]) for a
        fixed resolution -> (dets [max_faces, 15] normalized, valid)."""
        key = (h, w)
        if key not in self._detect_cache:
            self._detect_cache[key] = jax.jit(
                lambda v, img: self._detect(v, img, h, w)
            )
        return self._detect_cache[key]

    def detect_batch_fn(self, h: int, w: int):
        """Batched cascade: ONE jitted program with batch as a leading dim
        through every pyramid level and all three stages (vmap over the
        masked fixed-K single-image cascade — P/R/O-Net convs batch as
        [B * K, ...] automatically). Replaces the per-image python loop the
        round-1 registry entry used."""
        key = ("batch", h, w)
        if key not in self._detect_cache:
            self._detect_cache[key] = jax.jit(jax.vmap(
                lambda v, img: self._detect(v, img, h, w),
                in_axes=(None, 0),
            ))
        return self._detect_cache[key]

    def __call__(self, variables, img_bgr):
        h, w = int(img_bgr.shape[0]), int(img_bgr.shape[1])
        return self.detect_fn(h, w)(variables, img_bgr)

    # ---------------- pipeline ----------------

    def _detect(self, variables, img_bgr, h, w):
        cfg = self.cfg
        t1, t2, t3 = cfg.thresholds
        crop_m = cfg.crop_method
        if crop_m is None:
            from ..ops.platform import on_tpu
            crop_m = ("pallas" if on_tpu()
                      else "gather")
        # mtcnn operates on RGB, normalized (x - 127.5) / 128
        img = img_bgr.astype(jnp.float32)[..., ::-1]
        norm = (img - 127.5) * 0.0078125

        # ---- stage 1: P-Net over the pyramid ----
        # pyramid levels resample in the P-Net compute dtype: bf16 halves
        # the resize-GEMM bytes (8.7 -> ~4.4 ms at b64 576x1024) and P-Net
        # consumes bf16 anyway; the full-res `norm` (R/O-Net crop source)
        # stays f32
        level_boxes, level_scores, level_regs, level_valid = [], [], [], []
        for scale in pyramid_scales(h, w, cfg.min_size, cfg.factor):
            sh, sw = int(math.ceil(h * scale)), int(math.ceil(w * scale))
            resized = resize_bilinear(norm, (sh, sw), dtype=self.dtype)
            prob, reg = self.pnet.apply(variables["pnet"], resized[None])
            score = prob[0, :, :, 1]                       # [oh, ow]
            oh, ow = score.shape
            flat = score.reshape(-1)
            k = min(cfg.max_per_level, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            row = (idx // ow).astype(jnp.float32)
            col = (idx % ow).astype(jnp.float32)
            # generateBoundingBox: stride 2, cellsize 12, +1 origin, trunc
            x1 = jnp.trunc((2.0 * col + 1.0) / scale)
            y1 = jnp.trunc((2.0 * row + 1.0) / scale)
            x2 = jnp.trunc((2.0 * col + 12.0) / scale)
            y2 = jnp.trunc((2.0 * row + 12.0) / scale)
            boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
            valid = top > t1
            # per-level NMS 0.5 union (facenet +1-pixel IoU convention)
            keep = greedy_nms_mask(boxes, top, valid, 0.5, plus1=True)
            level_boxes.append(boxes)
            level_scores.append(top)
            level_regs.append(reg[0].reshape(-1, 4)[idx])
            level_valid.append(keep)

        if not level_boxes:
            z = jnp.zeros((cfg.max_faces, 15), jnp.float32)
            return z, jnp.zeros((cfg.max_faces,), bool)

        boxes = jnp.concatenate(level_boxes)
        scores = jnp.concatenate(level_scores)
        regs = jnp.concatenate(level_regs)
        valid = jnp.concatenate(level_valid)

        # global NMS 0.7 union, keep top max_stage1 (+1 convention)
        keep = greedy_nms_mask(boxes, scores, valid, 0.7, plus1=True)
        _, s_scores, s_valid, s_boxes, s_regs = sort_by_score(
            scores, keep, boxes, regs
        )
        boxes = s_boxes[: cfg.max_stage1]
        scores = s_scores[: cfg.max_stage1]
        regs = s_regs[: cfg.max_stage1]
        valid = s_valid[: cfg.max_stage1]

        # stage-1 regression (no +1 here, facenet uses w = x2-x1) + rerec
        bw = boxes[:, 2] - boxes[:, 0]
        bh = boxes[:, 3] - boxes[:, 1]
        boxes = jnp.stack(
            [
                boxes[:, 0] + regs[:, 0] * bw,
                boxes[:, 1] + regs[:, 1] * bh,
                boxes[:, 2] + regs[:, 2] * bw,
                boxes[:, 3] + regs[:, 3] * bh,
            ],
            axis=-1,
        )
        boxes = jnp.trunc(_rerec(boxes))

        # ---- stage 2: R-Net ----
        # facenet pad() crops img[y-1:ey, x-1:ex] — 1-based boxes, so the
        # 0-based crop region is origin (x1-1, y1-1), size (x2-x1+1, y2-y1+1)
        pad_shift = jnp.asarray([-1.0, -1.0, 0.0, 0.0], jnp.float32)
        crops = crop_and_resize_padded(norm, boxes + pad_shift, (24, 24),
                                       valid, method=crop_m,
                                       compute_dtype=self.dtype)
        prob, reg = self.rnet.apply(variables["rnet"], crops)
        score = prob[:, 1]
        valid = valid & (score > t2)
        keep = greedy_nms_mask(boxes, score, valid, 0.7, plus1=True)
        boxes = _bbreg(boxes, reg)
        boxes = jnp.trunc(_rerec(boxes))
        _, score, valid, boxes = sort_by_score(
            score, keep, boxes, top=cfg.max_stage2)

        # ---- stage 3: O-Net ----
        crops = crop_and_resize_padded(norm, boxes + pad_shift, (48, 48),
                                       valid, method=crop_m,
                                       compute_dtype=self.dtype)
        prob, reg, lmk = self.onet.apply(variables["onet"], crops)
        score = prob[:, 1]
        valid = valid & (score > t3)
        # landmarks decoded BEFORE regression (facenet order):
        bw = boxes[:, 2] - boxes[:, 0] + 1.0
        bh = boxes[:, 3] - boxes[:, 1] + 1.0
        lx = bw[:, None] * lmk[:, 0:5] + boxes[:, 0:1] - 1.0
        ly = bh[:, None] * lmk[:, 5:10] + boxes[:, 1:2] - 1.0
        boxes = _bbreg(boxes, reg)
        keep = greedy_nms_mask(boxes, score, valid, 0.7, plus1=True,
                               mode="min")

        # interleave landmarks to [x1, y1, ..., x5, y5] and normalize
        lmk_pairs = jnp.stack([lx, ly], axis=-1).reshape(-1, 10)
        dets = jnp.concatenate([boxes, lmk_pairs, score[:, None]], axis=-1)
        denom = jnp.asarray([w, h] * 7 + [1], jnp.float32)
        dets = dets / denom
        _, _, out_valid, out = sort_by_score(score, keep, dets,
                                             top=cfg.max_faces)
        return out, out_valid
