"""SSD MultiBox training — the trainable path for the res10/OpenCV SSD
family (reference ``modules/opencv2_dnn/model.py``; its
res10_300x300_ssd_iter_140000.caffemodel was produced by exactly this loss).

TPU-first shape discipline: prior matching is one dense [B, N, T] IoU
tensor (no per-image python), hard negative mining is a fixed-shape rank
mask (sort-of-sort trick) instead of dynamic top-k per image, and the whole
step — uint8 BGR batch, mean subtraction, forward, matching, loss, EMA —
is a single jitted program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.ssd import SSDConfig, SSDFaceNet, generate_priors
from ..ops.boxes import iou_matrix, xywh2xyxy
from .detection import (decay_mask, ema_update, lr_schedule,
                        mined_conf_loss)

OPENCV_SSD_MEAN = (104.0, 117.0, 123.0)  # BGR mean (ops/preprocess.py)


@dataclasses.dataclass(frozen=True)
class SSDTrainConfig:
    backbone: str = "resnet10"
    input_size: Tuple[int, int] = (300, 300)
    max_targets: int = 32
    iou_pos: float = 0.5           # prior->gt match threshold (SSD paper)
    neg_ratio: int = 3             # hard negatives per positive
    loc_gain: float = 1.0
    lr: float = 0.001
    momentum: float = 0.9
    weight_decay: float = 5e-4
    lrf: float = 0.1
    warmup_steps: int = 0
    total_steps: int = 0
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0

    # reuse detection.lr_schedule's field names
    @property
    def arch(self):
        return f"ssd-{self.backbone}"


def encode_ssd_targets(
    priors: jnp.ndarray,
    gt_cxcywh: jnp.ndarray,
    gt_valid: jnp.ndarray,
    variances=(0.1, 0.1, 0.2, 0.2),
    iou_pos: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense SSD matching + variance encoding.

    priors: [N, 4] cxcywh normalized. gt: [B, T, 4] cxcywh normalized,
    gt_valid [B, T]. Returns (loc_t [B, N, 4] encoded offsets,
    pos [B, N] bool). Matching is the SSD paper's: every prior takes its
    best GT above ``iou_pos``, and every GT additionally claims its single
    best prior (bipartite force) so no GT goes unmatched.
    """
    b, t = gt_cxcywh.shape[:2]
    n = priors.shape[0]
    pri_xyxy = xywh2xyxy(priors)                           # [N, 4]
    gt_xyxy = xywh2xyxy(gt_cxcywh)                         # [B, T, 4]
    iou = iou_matrix(pri_xyxy[None], gt_xyxy, eps=1e-9)    # [B, N, T]
    iou = jnp.where(gt_valid[:, None, :], iou, -1.0)

    # bipartite force: each valid GT claims its best prior with iou 2.0
    best_prior = jnp.argmax(iou, axis=1)                   # [B, T]
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
    tidx = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    bsafe = jnp.where(gt_valid, bidx, b)                   # drop invalid rows
    iou = iou.at[bsafe, best_prior, tidx].set(2.0, mode="drop")

    best_gt_iou = jnp.max(iou, axis=2)                     # [B, N]
    best_gt = jnp.argmax(iou, axis=2)                      # [B, N]
    pos = best_gt_iou >= iou_pos

    g = jnp.take_along_axis(gt_cxcywh, best_gt[..., None], axis=1)  # [B,N,4]
    v = variances
    pw = jnp.maximum(priors[None, :, 2:], 1e-9)
    t_xy = (g[..., :2] - priors[None, :, :2]) / pw / jnp.asarray(v[:2])
    t_wh = jnp.log(jnp.maximum(g[..., 2:], 1e-9) / pw) / jnp.asarray(v[2:])
    loc_t = jnp.concatenate([t_xy, t_wh], axis=-1)
    return loc_t, pos


def ssd_multibox_loss(
    locs: jnp.ndarray,
    conf_logits: jnp.ndarray,
    loc_t: jnp.ndarray,
    pos: jnp.ndarray,
    neg_ratio: int = 3,
    loc_gain: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """SSD loss: smooth-L1 on matched offsets + CE with 3:1 hard-negative
    mining, normalized by positive count (Liu et al. eq. 1).

    Mining is shape-static: negatives are ranked by their CE loss per image
    (double-argsort rank) and the top ``neg_ratio * n_pos`` kept."""
    posf = pos.astype(jnp.float32)
    n_pos = jnp.sum(posf, axis=1)                          # [B]

    diff = jnp.abs(locs - loc_t)
    smooth = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).sum(-1)
    l_loc = jnp.sum(smooth * posf) / jnp.maximum(jnp.sum(n_pos), 1.0)

    labels = pos.astype(jnp.int32)                         # face=1, bg=0
    ce = optax.softmax_cross_entropy_with_integer_labels(conf_logits, labels)
    l_conf = mined_conf_loss(ce, pos, neg_ratio)
    total = loc_gain * l_loc + l_conf
    return total, {"box": l_loc, "obj": l_conf,
                   "lmk": jnp.zeros(()), "cls": jnp.zeros(())}


def create_ssd_train_state(cfg: SSDTrainConfig, rng: jax.Array) -> Dict[str, Any]:
    mcfg = SSDConfig(backbone=cfg.backbone, input_size=cfg.input_size)
    net = SSDFaceNet(cfg=mcfg)
    w, h = cfg.input_size
    variables = jax.jit(net.init, static_argnames=("train",))(
        rng, jnp.zeros((1, h, w, 3), jnp.float32), train=True)
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
        optax.sgd(lr_schedule(cfg), momentum=cfg.momentum),
    )
    return {
        "net": net, "cfg": cfg, "mcfg": mcfg, "tx": tx,
        "priors": jnp.asarray(generate_priors(mcfg)),
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "opt_state": tx.init(variables["params"]),
        "ema_params": jax.tree_util.tree_map(jnp.copy, variables["params"]),
    }


def make_ssd_train_step_ema(state: Dict[str, Any]):
    """Same signature as detection.make_det_train_step_ema so train loops
    are family-agnostic: step(params, batch_stats, opt_state, ema, n,
    images, targets, valid) -> (new..., loss, metrics).

    images: [B, H, W, 3] uint8 BGR (the OpenCV-SSD convention — NO RGB
    swap); targets [B, T, 14] pixel rows (landmark columns ignored)."""
    net: SSDFaceNet = state["net"]
    cfg: SSDTrainConfig = state["cfg"]
    mcfg: SSDConfig = state["mcfg"]
    tx = state["tx"]
    priors = state["priors"]
    w, h = cfg.input_size
    mean = jnp.asarray(OPENCV_SSD_MEAN, jnp.float32)
    scale = jnp.asarray([w, h, w, h], jnp.float32)

    def loss_fn(params, batch_stats, images, targets, target_valid):
        x = images.astype(jnp.float32) - mean
        (locs, conf), updates = net.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        gt = targets[..., :4] / scale
        loc_t, pos = encode_ssd_targets(
            priors, gt, target_valid, mcfg.variances, cfg.iou_pos)
        loss, metrics = ssd_multibox_loss(
            locs, conf, loc_t, pos, cfg.neg_ratio, cfg.loc_gain)
        return loss, (updates["batch_stats"], metrics)

    def step(params, batch_stats, opt_state, ema, n, images, targets, valid):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, images, targets, valid)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        n = n + 1
        new_ema = ema_update(ema, new_params, n.astype(jnp.float32), cfg)
        return new_params, new_stats, new_opt, new_ema, n, loss, metrics

    return step
