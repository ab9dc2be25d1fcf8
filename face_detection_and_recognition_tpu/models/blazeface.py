"""BlazeFace (MediaPipe) front/back detectors, TPU-native.

Architecture contract from the reference torch reimplementation
(``modules/blazeface/blazeface.py:71-228``); anchors are generated from the
MediaPipe SSD anchor options instead of loading ``anchors.npy`` (both the
front 128x128 and back 256x256 graphs yield the same 896 anchor centers:
16x16 cells x2 + 8x8 cells x6, all unit-sized with fixed_anchor_size=True).

TPU-first differences from the reference:
  * NHWC end to end — the classifier/regressor head reshape needs no
    permute (the torch version permutes NCHW->NHWC before flattening,
    blazeface.py:206-227, so anchor ordering matches exactly).
  * decode + score-sigmoid + thresholding + weighted-blend NMS run inside
    the same jitted program as the backbone — the per-image python NMS loop
    (blazeface.py:404-458) becomes a fixed-trip masked fori_loop (ops/nms.py).
  * fixed-size [B, max_faces, 17] output + validity mask.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.nms import weighted_blend_nms
from .layers import BlazeBlock, Dtype, FinalBlazeBlock


def generate_anchors() -> np.ndarray:
    """MediaPipe SSD anchors for both blazeface variants: [896, 4] rows of
    [x_center, y_center, w=1, h=1] in normalized units.

    Derived from ssd_anchors_calculator options (num_layers=4,
    strides front=[8,16,16,16] / back=[16,32,32,32], aspect_ratios=[1.0],
    interpolated_scale_aspect_ratio=1.0, fixed_anchor_size=True): same-stride
    layers merge, giving 2 anchors/cell on the 16x16 map and 6 on the 8x8.
    """
    anchors = []
    for fm, per_cell in ((16, 2), (8, 6)):
        for y in range(fm):
            for x in range(fm):
                cx, cy = (x + 0.5) / fm, (y + 0.5) / fm
                anchors.extend([[cx, cy, 1.0, 1.0]] * per_cell)
    return np.asarray(anchors, np.float32)


@dataclasses.dataclass(frozen=True)
class BlazeFaceConfig:
    back_model: bool = False
    score_clipping_thresh: float = 100.0
    min_suppression_threshold: float = 0.3
    max_faces: int = 16

    @property
    def input_size(self) -> Tuple[int, int]:
        return (256, 256) if self.back_model else (128, 128)

    @property
    def scale(self) -> float:
        return 256.0 if self.back_model else 128.0

    @property
    def min_score_thresh(self) -> float:
        return 0.65 if self.back_model else 0.75


class BlazeFaceNet(nn.Module):
    """Backbone + dual-scale heads; returns raw [B,896,16] and [B,896,1].

    ``zero_head_init`` zero-initializes the 4 head convs for from-scratch
    TRAINING (train/blazeface.py): the norm-free backbone emits activations
    in the hundreds at init, and zero heads start scores/boxes at exactly 0
    instead of +-100 logits. Parameter structure is identical either way, so
    checkpoints interoperate with the inference builder."""

    back_model: bool = False
    dtype: Dtype = jnp.float32
    zero_head_init: bool = False

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        # TFLite-style first-conv padding (blazeface.py:193-195)
        x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))
        x = nn.Conv(24, (5, 5), strides=(2, 2), padding="VALID", use_bias=True,
                    dtype=self.dtype, name="conv0")(x)
        x = nn.relu(x)
        if self.back_model:
            for ch, stride in (
                [(24, 1)] * 7 + [(24, 2)] + [(24, 1)] * 7 + [(48, 2)]
                + [(48, 1)] * 7 + [(96, 2)] + [(96, 1)] * 7
            ):
                x = BlazeBlock(ch, stride=stride, dtype=self.dtype)(x)
            h = FinalBlazeBlock(96, dtype=self.dtype)(x)
            c8_in, c16_in = x, h
        else:
            for ch, stride in (
                (24, 1), (28, 1), (32, 2), (36, 1), (42, 1), (48, 2),
                (56, 1), (64, 1), (72, 1), (80, 1), (88, 1),
            ):
                x = BlazeBlock(ch, stride=stride, dtype=self.dtype)(x)
            h = x
            for ch, stride in ((96, 2), (96, 1), (96, 1), (96, 1), (96, 1)):
                h = BlazeBlock(ch, stride=stride, dtype=self.dtype)(h)
            c8_in, c16_in = x, h

        # heads: NHWC flattening matches the reference's permute+reshape order
        hk = ({"kernel_init": nn.initializers.zeros}
              if self.zero_head_init else {})
        c1 = nn.Conv(2, (1, 1), use_bias=True, dtype=self.dtype,
                     name="classifier_8", **hk)(c8_in)
        c2 = nn.Conv(6, (1, 1), use_bias=True, dtype=self.dtype,
                     name="classifier_16", **hk)(c16_in)
        r1 = nn.Conv(32, (1, 1), use_bias=True, dtype=self.dtype,
                     name="regressor_8", **hk)(c8_in)
        r2 = nn.Conv(96, (1, 1), use_bias=True, dtype=self.dtype,
                     name="regressor_16", **hk)(c16_in)
        scores = jnp.concatenate([c1.reshape(b, -1, 1), c2.reshape(b, -1, 1)], axis=1)
        boxes = jnp.concatenate([r1.reshape(b, -1, 16), r2.reshape(b, -1, 16)], axis=1)
        return boxes.astype(jnp.float32), scores.astype(jnp.float32)


def decode_boxes(raw_boxes: jnp.ndarray, anchors: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Anchor decode (blazeface.py:373-402): outputs [..., 896, 16] rows
    [ymin, xmin, ymax, xmax, kp0x, kp0y, ... kp5x, kp5y] in normalized units."""
    ax, ay = anchors[:, 0], anchors[:, 1]
    aw, ah = anchors[:, 2], anchors[:, 3]
    x_c = raw_boxes[..., 0] / scale * aw + ax
    y_c = raw_boxes[..., 1] / scale * ah + ay
    w = raw_boxes[..., 2] / scale * aw
    h = raw_boxes[..., 3] / scale * ah
    cols = [y_c - h / 2.0, x_c - w / 2.0, y_c + h / 2.0, x_c + w / 2.0]
    for k in range(6):
        off = 4 + k * 2
        cols.append(raw_boxes[..., off] / scale * aw + ax)
        cols.append(raw_boxes[..., off + 1] / scale * ah + ay)
    return jnp.stack(cols, axis=-1)


@partial(jax.jit, static_argnames=("cfg",))
def blazeface_postprocess(
    raw_boxes: jnp.ndarray,
    raw_scores: jnp.ndarray,
    anchors: jnp.ndarray,
    cfg: BlazeFaceConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode + clip/sigmoid scores + threshold + weighted-blend NMS.

    Returns dets [B, max_faces, 17] rows [xmin, ymin, xmax, ymax,
    kps..., conf] (already reordered to the wrapper contract,
    ``modules/blazeface/model.py:70``) and a validity mask [B, max_faces].
    """
    boxes = decode_boxes(raw_boxes, anchors, cfg.scale)
    clipped = jnp.clip(raw_scores[..., 0], -cfg.score_clipping_thresh,
                       cfg.score_clipping_thresh)
    scores = jax.nn.sigmoid(clipped)
    mask = scores >= cfg.min_score_thresh
    dets = jnp.concatenate([boxes, scores[..., None]], axis=-1)  # [B,896,17]

    nms = jax.vmap(
        lambda d, v: weighted_blend_nms(
            d, v, cfg.min_suppression_threshold, cfg.max_faces
        )
    )
    out, out_valid = nms(dets, mask)
    # [ymin,xmin,ymax,xmax,...] -> [xmin,ymin,xmax,ymax,...]
    reorder = jnp.asarray([1, 0, 3, 2] + list(range(4, 17)))
    return out[..., reorder], out_valid


def make_blazeface(cfg: BlazeFaceConfig, rng: jax.Array = None, dtype=jnp.float32):
    """Build net + params + a fully jitted detect function.

    detect(params, imgs_preprocessed [B,H,W,3] in [-1,1] RGB) ->
    (dets [B,max_faces,17] normalized, valid [B,max_faces]).
    """
    net = BlazeFaceNet(back_model=cfg.back_model, dtype=dtype)
    w, h = cfg.input_size
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = jax.jit(net.init)(rng, jnp.zeros((1, h, w, 3), jnp.float32))
    anchors = jnp.asarray(generate_anchors())

    @jax.jit
    def detect(params, imgs):
        raw_boxes, raw_scores = net.apply(params, imgs)
        return blazeface_postprocess(raw_boxes, raw_scores, anchors, cfg)

    return net, params, detect
