"""BlazeFace training — the trainable path for the MediaPipe-family
detector (reference ``modules/blazeface/blazeface.py``; its blazeface.pth /
blazefaceback.pth weights came from exactly this anchor scheme).

TPU-first like train/ssd.py: matching is one dense [B, N, T] mask (anchor
centers inside GT central regions + per-GT nearest-anchor force), the score
loss hard-negative-mines with a static rank trick, and the whole step is a
single jitted program with the shared family signature
``step(params, batch_stats, opt_state, ema, n, images_u8, targets, valid)``
so the device-resident loop (train/device_loop.py) drives it unchanged.
BlazeFace's anchors are fixed unit squares (generate_anchors,
fixed_anchor_size=True), so box targets are the model's raw regression
units: ``(gt - anchor_center) * scale`` for xy and ``gt_wh * scale`` for wh
(the exact inverse of models/blazeface.decode_boxes).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.blazeface import BlazeFaceNet, generate_anchors
from .detection import (decay_mask, ema_update, lr_schedule,
                        mined_conf_loss, weighted_bce_logits)


@dataclasses.dataclass(frozen=True)
class BlazeTrainConfig:
    back_model: bool = False
    max_targets: int = 8
    center_frac: float = 0.6       # positive if anchor center in this GT core
    neg_ratio: int = 3             # hard negatives per positive
    box_gain: float = 1.0
    lr: float = 0.002
    weight_decay: float = 1e-5
    lrf: float = 0.1
    warmup_steps: int = 0
    total_steps: int = 0
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0

    @property
    def input_size(self) -> Tuple[int, int]:
        return (256, 256) if self.back_model else (128, 128)

    @property
    def scale(self) -> float:
        return 256.0 if self.back_model else 128.0

    @property
    def arch(self) -> str:
        return "blazeface-back" if self.back_model else "blazeface-front"


def encode_blazeface_targets(
    anchors: jnp.ndarray,
    gt_cxcywh: jnp.ndarray,
    gt_valid: jnp.ndarray,
    scale: float,
    center_frac: float = 0.6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense matching + raw-unit encoding.

    anchors: [N, 4] (cx, cy, 1, 1) normalized. gt: [B, T, 4] cxcywh
    normalized, gt_valid [B, T]. Returns (box_t [B, N, 4] raw regression
    targets, pos [B, N] bool). An anchor is positive for the GT whose
    central ``center_frac`` region contains its center (smallest such GT
    wins, so nested faces keep their own anchors); every valid GT also
    force-claims its nearest anchor so no GT goes unmatched."""
    b, t = gt_cxcywh.shape[:2]
    n = anchors.shape[0]
    ac = anchors[:, :2]                                     # [N, 2]
    d = jnp.abs(ac[None, :, None, :] - gt_cxcywh[:, None, :, :2])  # [B,N,T,2]
    half = gt_cxcywh[:, None, :, 2:] * (center_frac / 2.0)
    inside = jnp.all(d <= half, axis=-1) & gt_valid[:, None, :]    # [B,N,T]

    # nearest-anchor force per GT (center L2)
    dist2 = jnp.sum(
        (ac[None, :, None, :] - gt_cxcywh[:, None, :, :2]) ** 2, axis=-1)
    best_anchor = jnp.argmin(dist2, axis=1)                 # [B, T]
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
    tidx = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    bsafe = jnp.where(gt_valid, bidx, b)
    inside = inside.at[bsafe, best_anchor, tidx].set(True, mode="drop")

    # each positive anchor regresses its SMALLEST containing GT
    area = gt_cxcywh[..., 2] * gt_cxcywh[..., 3]            # [B, T]
    cand = jnp.where(inside, area[:, None, :], jnp.inf)
    best_gt = jnp.argmin(cand, axis=2)                      # [B, N]
    pos = jnp.any(inside, axis=2)

    g = jnp.take_along_axis(gt_cxcywh, best_gt[..., None], axis=1)  # [B,N,4]
    t_xy = (g[..., :2] - ac[None]) * scale
    t_wh = g[..., 2:] * scale
    return jnp.concatenate([t_xy, t_wh], axis=-1), pos


def blazeface_loss(
    raw_boxes: jnp.ndarray,
    raw_scores: jnp.ndarray,
    box_t: jnp.ndarray,
    pos: jnp.ndarray,
    scale: float,
    neg_ratio: int = 3,
    box_gain: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Smooth-L1 on matched raw offsets (normalized by ``scale`` so
    magnitudes are ~unit) + sigmoid BCE on scores with 3:1 hard-negative
    mining — the single-logit analog of the SSD MultiBox loss."""
    posf = pos.astype(jnp.float32)
    n_pos = jnp.sum(posf, axis=1)

    diff = jnp.abs(raw_boxes[..., :4] - box_t) / scale
    smooth = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).sum(-1)
    l_box = jnp.sum(smooth * posf) / jnp.maximum(jnp.sum(n_pos), 1.0)

    logits = raw_scores[..., 0]
    ce = weighted_bce_logits(logits, posf)
    l_conf = mined_conf_loss(ce, pos, neg_ratio)
    total = box_gain * l_box + l_conf
    return total, {"box": l_box, "obj": l_conf,
                   "lmk": jnp.zeros(()), "cls": jnp.zeros(())}


def create_blaze_train_state(cfg: BlazeTrainConfig, rng: jax.Array) -> Dict[str, Any]:
    # zero-init heads: the norm-free backbone emits huge activations at
    # init; AdamW + global-norm clipping handles the per-layer scale spread
    # SGD cannot (the backbone has no BatchNorm to re-equalize it)
    net = BlazeFaceNet(back_model=cfg.back_model, zero_head_init=True)
    w, h = cfg.input_size
    variables = jax.jit(net.init)(rng, jnp.zeros((1, h, w, 3), jnp.float32))
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(lr_schedule(cfg), weight_decay=cfg.weight_decay,
                    mask=decay_mask),
    )
    return {
        "net": net, "cfg": cfg, "tx": tx,
        "anchors": jnp.asarray(generate_anchors()),
        "params": variables["params"],
        # no BatchNorm in BlazeFace: an empty stats tree keeps the family
        # step signature (device_loop EMAs it as a no-op)
        "batch_stats": {},
        "opt_state": tx.init(variables["params"]),
        "ema_params": jax.tree_util.tree_map(jnp.copy, variables["params"]),
    }


def make_blaze_train_step_ema(state: Dict[str, Any]):
    """Family-signature step: images [B, H, W, 3] uint8 RGB (the blazeface
    convention after bgr_to_rgb; normalized x/127.5 - 1 on device);
    targets [B, T, 14] pixel rows (landmark columns ignored)."""
    net: BlazeFaceNet = state["net"]
    cfg: BlazeTrainConfig = state["cfg"]
    tx = state["tx"]
    anchors = state["anchors"]
    w, h = cfg.input_size
    img_scale = jnp.asarray([w, h, w, h], jnp.float32)

    def loss_fn(params, images, targets, target_valid):
        x = images.astype(jnp.float32) / 127.5 - 1.0
        raw_boxes, raw_scores = net.apply({"params": params}, x)
        gt = targets[..., :4] / img_scale
        box_t, pos = encode_blazeface_targets(
            anchors, gt, target_valid, cfg.scale, cfg.center_frac)
        return blazeface_loss(raw_boxes, raw_scores, box_t, pos, cfg.scale,
                              cfg.neg_ratio, cfg.box_gain)

    def step(params, batch_stats, opt_state, ema, n, images, targets, valid):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, targets, valid)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        n = n + 1
        new_ema = ema_update(ema, new_params, n.astype(jnp.float32), cfg)
        return new_params, batch_stats, new_opt, new_ema, n, loss, metrics

    return step
