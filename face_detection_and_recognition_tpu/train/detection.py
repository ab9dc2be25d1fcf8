"""YOLOv5-face detector training: losses + data-parallel train step.

The reference vendors the yolov5-face training losses as dead code
(``pytorch/utils/loss.py``: CIoU box loss, BCE objectness/class loss,
Wing-loss landmarks — SURVEY.md §2.6 notes no train.py exists). Here they are
a live subsystem: pure jnp losses over the raw NHWC detect maps plus a jitted
train step sharded over the mesh "data" axis, so detectors can be fine-tuned
(e.g. on WIDER-FACE) rather than only imported.

Target assignment follows the yolov5 recipe: for each ground-truth face,
anchors with max(w_ratio, h_ratio) < 4 at the matching grid cell (and its two
nearest neighbor cells) become positives.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.yolov5_face import ARCHS, YoloV5FaceNet
from ..ops.boxes import xywh2xyxy


def ciou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU between [..., 4] xywh boxes (loss.py bbox_iou CIoU=True)."""
    b1 = xywh2xyxy(box1)
    b2 = xywh2xyxy(box2)
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = box1[..., 2] * box1[..., 3]
    a2 = box2[..., 2] * box2[..., 3]
    union = a1 + a2 - inter + eps
    iou = inter / union
    # enclosing box diagonal
    c_lt = jnp.minimum(b1[..., :2], b2[..., :2])
    c_rb = jnp.maximum(b1[..., 2:], b2[..., 2:])
    c2 = jnp.sum((c_rb - c_lt) ** 2, axis=-1) + eps
    rho2 = jnp.sum(((box1[..., :2] - box2[..., :2])) ** 2, axis=-1)
    v = (4 / math.pi**2) * (
        jnp.arctan(box2[..., 2] / (box2[..., 3] + eps))
        - jnp.arctan(box1[..., 2] / (box1[..., 3] + eps))
    ) ** 2
    alpha = v / (v - iou + (1 + eps))
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


def wing_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
              w: float = 10.0, e: float = 2.0) -> jnp.ndarray:
    """Wing loss for landmark regression (loss.py WingLoss), masked mean.

    mask also zeroes out invisible landmarks (target < 0 convention)."""
    c = w - w * math.log(1.0 + w / e)
    d = jnp.abs(pred - target)
    losses = jnp.where(d < w, w * jnp.log(1.0 + d / e), d - c)
    losses = losses * mask
    return jnp.sum(losses) / jnp.maximum(jnp.sum(mask), 1.0)


@dataclasses.dataclass(frozen=True)
class DetTrainConfig:
    arch: str = "yolov5n"
    nc: int = 1
    input_size: Tuple[int, int] = (640, 640)
    max_targets: int = 32          # padded GT faces per image
    box_gain: float = 0.05
    obj_gain: float = 1.0
    cls_gain: float = 0.5
    lmk_gain: float = 0.005
    anchor_t: float = 4.0          # anchor ratio threshold
    lr: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 5e-4
    # --- schedule / loss-shape knobs (reference loss.py + train hyp) ---
    # per-level objectness balance: small-face level weighted 4x so P3 is not
    # drowned by the coarser grids (loss.py ``balance=[4.0,1.0,0.4]``)
    level_balance: Tuple[float, ...] = (4.0, 1.0, 0.4)
    obj_pw: float = 1.0            # objectness BCE pos_weight (hyp obj_pw)
    cls_pw: float = 1.0            # class BCE pos_weight (hyp cls_pw)
    gr: float = 1.0                # iou-ratio for tobj: (1-gr) + gr*iou
    lrf: float = 0.2               # final LR fraction for cosine decay
    warmup_steps: int = 0          # linear LR warmup steps (0 = constant-lr SGD)
    total_steps: int = 0           # cosine horizon; 0 disables the schedule
    ema_decay: float = 0.9999      # ModelEMA decay ceiling (0 disables EMA)
    ema_tau: float = 2000.0        # ramp: d = decay*(1-exp(-updates/tau))
    # False = official (multiclass) yolov5 head: no = nc+5, class logits
    # directly after the objectness column (reference onnx_utils.py:193-288)
    with_landmarks: bool = True


def anchors_for(cfg: "DetTrainConfig"):
    """The anchor set the ENGINE will decode this head with: yolov5-face's
    re-tuned anchors for the landmark head, the official yolov5s.yaml set
    for the landmark-less head (make_yolov5_official decodes with
    OFFICIAL_ANCHORS — training against any other set mis-scales wh)."""
    if cfg.with_landmarks:
        return ARCHS[cfg.arch]["anchors"]
    from ..models.yolov5_face import OFFICIAL_ANCHORS

    return OFFICIAL_ANCHORS


def build_targets(
    targets: jnp.ndarray,
    target_valid: jnp.ndarray,
    anchors: Sequence[Sequence[Tuple[float, float]]],
    strides: Sequence[int],
    grid_hw: Sequence[Tuple[int, int]],
    anchor_t: float,
) -> Dict[str, Any]:
    """Dense target maps from padded GT.

    targets: [B, T, 14] rows [cx, cy, w, h, lmk x10] in input pixels.
    Returns per level: tobj [B,na,gh,gw], tbox [B,na,gh,gw,4] (xywh in grid
    units relative to cell), tlmk [B,na,gh,gw,10], masks.
    """
    out = []
    for anc, stride, (gh, gw) in zip(anchors, strides, grid_hw):
        na = len(anc)
        anc_arr = jnp.asarray(anc, jnp.float32) / stride      # grid units
        t = targets / stride                                   # to grid units
        cx, cy = t[..., 0], t[..., 1]
        w, h = t[..., 2], t[..., 3]
        gi0 = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, gw - 1)  # [B, T]
        gj0 = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, gh - 1)
        # yolov5 neighbor-cell expansion (loss.py build_targets, off=0.5):
        # each GT is also assigned to the nearest lateral cell in x and in y,
        # tripling positives; the xy target stays in the head's (-0.5, 1.5)
        # decode range relative to the assigned cell.
        fx, fy = cx - jnp.floor(cx), cy - jnp.floor(cy)
        gi_n = jnp.clip(gi0 + jnp.where(fx < 0.5, -1, 1), 0, gw - 1)
        gj_n = jnp.clip(gj0 + jnp.where(fy < 0.5, -1, 1), 0, gh - 1)
        ok_x = jnp.where(fx < 0.5, cx > 1.0, cx < gw - 1.0)
        ok_y = jnp.where(fy < 0.5, cy > 1.0, cy < gh - 1.0)

        def expand(center, x_neigh, y_neigh):
            # [B, T] x3 -> [B, 3T] (variant-major along the target axis)
            return jnp.concatenate([center, x_neigh, y_neigh], axis=1)

        gi = expand(gi0, gi_n, gi0)                            # [B, 3T]
        gj = expand(gj0, gj0, gj_n)
        cell_ok = expand(jnp.ones_like(ok_x), ok_x, ok_y)
        rep = lambda a: jnp.concatenate([a, a, a], axis=1)
        cx_e, cy_e, w_e, h_e = rep(cx), rep(cy), rep(w), rep(h)

        # anchor match: max ratio < anchor_t (size-only, same per variant)
        r_w = w_e[..., None] / anc_arr[None, None, :, 0]
        r_h = h_e[..., None] / anc_arr[None, None, :, 1]
        ratio = jnp.maximum(
            jnp.maximum(r_w, 1.0 / jnp.maximum(r_w, 1e-9)),
            jnp.maximum(r_h, 1.0 / jnp.maximum(r_h, 1e-9)),
        )
        match = ((ratio < anchor_t) & rep(target_valid)[..., None]
                 & cell_ok[..., None])                         # [B, 3T, na]

        b = targets.shape[0]
        tt = gi.shape[1]
        tobj = jnp.zeros((b, na, gh, gw), jnp.float32)
        tbox = jnp.zeros((b, na, gh, gw, 4), jnp.float32)
        tlmk = jnp.zeros((b, na, gh, gw, 10), jnp.float32)
        lmk_mask = jnp.zeros((b, na, gh, gw, 10), jnp.float32)

        bidx = jnp.broadcast_to(jnp.arange(b)[:, None, None], (b, tt, na))
        # route non-matching rows to an out-of-range batch index so
        # mode="drop" discards them — a padded/unmatched row must never
        # clobber a real target sharing its (cell, anchor) slot
        bsafe = jnp.where(match, bidx, b)
        aidx = jnp.broadcast_to(jnp.arange(na)[None, None, :], (b, tt, na))
        gjb = jnp.broadcast_to(gj[..., None], (b, tt, na))
        gib = jnp.broadcast_to(gi[..., None], (b, tt, na))

        boxv = jnp.stack([cx_e - gi, cy_e - gj, w_e, h_e], axis=-1)
        boxb = jnp.broadcast_to(boxv[:, :, None, :], (b, tt, na, 4))
        lmk = jnp.concatenate([t[..., 4:14]] * 3, axis=1)       # [B, 3T, 10]
        # landmarks relative to the assigned cell in grid units
        lmk_rel = lmk - jnp.stack([gi, gj] * 5, axis=-1).astype(jnp.float32)
        lmkb = jnp.broadcast_to(lmk_rel[:, :, None, :], (b, tt, na, 10))
        lmk_vis = jnp.broadcast_to(
            (lmk > 0).astype(jnp.float32)[:, :, None, :], (b, tt, na, 10))

        tobj = tobj.at[bsafe, aidx, gjb, gib].max(
            match.astype(jnp.float32), mode="drop")
        tbox = tbox.at[bsafe, aidx, gjb, gib].set(boxb, mode="drop")
        tlmk = tlmk.at[bsafe, aidx, gjb, gib].set(lmkb, mode="drop")
        lmk_mask = lmk_mask.at[bsafe, aidx, gjb, gib].set(
            lmk_vis, mode="drop")
        out.append({
            "tobj": tobj, "tbox": tbox, "tlmk": tlmk, "lmk_mask": lmk_mask,
            "anchors": anc_arr,
        })
    return out


def weighted_bce_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                        pos_weight: float = 1.0) -> jnp.ndarray:
    """BCE-with-logits with a positive-class weight (BCEWithLogitsLoss
    pos_weight semantics): -[pw*z*log s(x) + (1-z)*log(1-s(x))]."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)


def detection_loss(
    maps: Sequence[jnp.ndarray],
    targets_per_level: Sequence[Dict[str, Any]],
    cfg: DetTrainConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss over raw detect maps [B, na, gh, gw, no].

    Follows the reference recipe (loss.py compute_loss): CIoU box loss,
    BCE objectness with per-level ``balance`` weights + ``obj_pw``, iou-ratio
    objectness targets ``(1-gr) + gr*iou``, Wing landmarks, and class BCE only
    when nc > 1 (single-class skips it, loss.py:162)."""
    lbox = lobj = llmk = lcls = 0.0
    nl = len(maps)
    balance = list(cfg.level_balance)
    if len(balance) < nl:  # P3-P6 variants: extend like [4.0,1.0,0.4,0.1]
        balance = balance + [0.1] * (nl - len(balance))
    for m, t, bal in zip(maps, targets_per_level, balance):
        pobj = m[..., 4]
        pos = t["tobj"]                                # [B,na,gh,gw] 0/1
        # box: sigmoid decode in grid units (xy in (-0.5,1.5), wh (2s)^2*anc)
        pxy = jax.nn.sigmoid(m[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(m[..., 2:4]) * 2.0) ** 2 * t["anchors"][None, :, None, None, :]
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        iou = ciou(pbox, t["tbox"])
        lbox += jnp.sum((1.0 - iou) * pos) / jnp.maximum(jnp.sum(pos), 1.0)
        # objectness: iou-ratio targets at positives, balanced per level
        tconf = pos * (
            (1.0 - cfg.gr)
            + cfg.gr * jnp.clip(jax.lax.stop_gradient(iou), 0.0, None)
        )
        lobj += weighted_bce_logits(pobj, tconf, cfg.obj_pw).mean() * bal
        # landmarks: wing loss on anchor-scaled offsets (face head only —
        # the official head has no landmark columns)
        if cfg.with_landmarks:
            planc = m[..., 5:15] * jnp.tile(
                t["anchors"][None, :, None, None, :], (1, 1, 1, 1, 5)
            )
            llmk += wing_loss(planc, t["tlmk"], t["lmk_mask"])
        # class loss at positive cells (faces are class 0; targets carry no
        # class column — extend build_targets for real multi-class data).
        # The face head skips it at nc==1 (loss.py:162), but the official
        # head multiplies conf = obj * cls at decode, so its class column
        # must be trained even single-class
        if cfg.nc > 1 or not cfg.with_landmarks:
            pcls = m[..., 15:] if cfg.with_landmarks else m[..., 5:]
            onehot = jax.nn.one_hot(jnp.zeros_like(pos, jnp.int32), cfg.nc)
            lcls += jnp.sum(
                weighted_bce_logits(pcls, onehot, cfg.cls_pw)
                * pos[..., None]
            ) / jnp.maximum(jnp.sum(pos) * cfg.nc, 1.0)
    total = (cfg.box_gain * lbox + cfg.obj_gain * lobj
             + cfg.lmk_gain * llmk + cfg.cls_gain * lcls)
    metrics = {"box": lbox, "obj": lobj, "lmk": llmk,
               "cls": jnp.asarray(lcls, jnp.float32)}
    return total, metrics


def lr_schedule(cfg: DetTrainConfig):
    """Warmup + cosine LR: linear 0 -> lr over ``warmup_steps``, then cosine
    to ``lr*lrf`` at ``total_steps`` (train.py one-cycle lf + warmup ramp).
    Returns an optax schedule, or the constant lr when total_steps == 0."""
    if cfg.total_steps <= 0:
        return cfg.lr
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0 if cfg.warmup_steps > 0 else cfg.lr,
        peak_value=cfg.lr,
        warmup_steps=max(cfg.warmup_steps, 0),
        decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        end_value=cfg.lr * cfg.lrf,
    )


def ema_update(ema_params, params, updates: jnp.ndarray, cfg: DetTrainConfig):
    """ModelEMA update (torch_utils.py:262-283): ramped decay
    d = decay*(1 - exp(-updates/tau)); ema = d*ema + (1-d)*params."""
    return ema_update_ramped(ema_params, params, updates,
                             cfg.ema_decay, cfg.ema_tau)


def ema_update_ramped(ema_params, params, updates: jnp.ndarray,
                      decay: float, tau: float):
    """The ramp formula itself, cfg-free so the device loop's BN-stats EMA
    shares the exact same update as the params EMA."""
    d = decay * (1.0 - jnp.exp(-updates / tau))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )


def mined_conf_loss(ce: jnp.ndarray, pos: jnp.ndarray,
                    neg_ratio: float) -> jnp.ndarray:
    """SSD-style hard-negative-mined confidence loss, shape-static and
    shared by the SSD and BlazeFace MultiBox losses: negatives ranked by
    their CE per image (double-argsort rank), the top ``neg_ratio * n_pos``
    kept, and the positive+mined sum normalized by the positive count
    (Liu et al. eq. 1). ``ce`` [B, N] per-anchor loss, ``pos`` [B, N] bool."""
    posf = pos.astype(jnp.float32)
    n_pos = jnp.sum(posf, axis=1)                          # [B]
    n = ce.shape[1]
    neg_ce = jnp.where(pos, -jnp.inf, ce)                  # negatives only
    order = jnp.argsort(-neg_ce, axis=1)
    rank = jnp.argsort(order, axis=1)                      # [B, N] desc rank
    n_neg = jnp.clip(neg_ratio * n_pos, 1.0, n - 1.0)
    neg = (rank < n_neg[:, None]) & ~pos
    return jnp.sum(ce * (posf + neg.astype(jnp.float32))) / jnp.maximum(
        jnp.sum(n_pos), 1.0)


def decay_mask(params):
    """Weight-decay mask following the reference recipe: train.py builds
    three param groups and applies decay ONLY to multiplicative weights
    (conv/dense kernels) — biases and BatchNorm scale/bias are exempt.
    Flax trees make this a leaf-name test: BN leaves are scale/bias and
    carry no 'kernel' key."""
    def _is_kernel(path, _):
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", ""))
        return "kernel" in str(name)

    return jax.tree_util.tree_map_with_path(_is_kernel, params)


def create_det_train_state(cfg: DetTrainConfig, rng: jax.Array) -> Dict[str, Any]:
    net = YoloV5FaceNet(arch=cfg.arch, nc=cfg.nc,
                        with_landmarks=cfg.with_landmarks)
    w, h = cfg.input_size
    variables = jax.jit(net.init)(rng, jnp.zeros((1, h, w, 3), jnp.float32))
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
        optax.sgd(lr_schedule(cfg), momentum=cfg.momentum),
    )
    return {
        "net": net, "cfg": cfg, "tx": tx,
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "opt_state": tx.init(variables["params"]),
        # EMA shadow of params (ModelEMA); updated only by the _ema step
        "ema_params": jax.tree_util.tree_map(jnp.copy, variables["params"]),
    }


def make_det_train_step(state: Dict[str, Any]):
    """Jittable step(params, batch_stats, opt_state, images, targets,
    target_valid) -> (new..., loss, metrics). images [B,H,W,3] in [0,1]."""
    net: YoloV5FaceNet = state["net"]
    cfg: DetTrainConfig = state["cfg"]
    tx = state["tx"]
    spec = ARCHS[cfg.arch]
    w, h = cfg.input_size
    grid_hw = [(h // s, w // s) for s in spec["strides"]]

    def loss_fn(params, batch_stats, images, targets, target_valid):
        if images.dtype == jnp.uint8:
            # uint8 batches upload at 1/4 the bytes of f32 (the tunnel is
            # the training wall on this rig); normalize on device instead
            images = images.astype(jnp.float32) / 255.0
        maps, updates = net.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        tpl = build_targets(targets, target_valid, anchors_for(cfg),
                            spec["strides"], grid_hw, cfg.anchor_t)
        total, metrics = detection_loss(maps, tpl, cfg)
        return total, (updates["batch_stats"], metrics)

    def step(params, batch_stats, opt_state, images, targets, target_valid):
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, images, targets, target_valid)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss, metrics

    return step


def make_det_train_step_ema(state: Dict[str, Any]):
    """Like make_det_train_step but also carries the EMA shadow in one fused
    program: step(params, batch_stats, opt_state, ema_params, n_updates,
    images, targets, target_valid) -> (new params/stats/opt/ema, loss,
    metrics). ``n_updates`` is a scalar int32 counter (for the decay ramp)."""
    base = make_det_train_step(state)
    cfg: DetTrainConfig = state["cfg"]

    def step(params, batch_stats, opt_state, ema_params, n_updates,
             images, targets, target_valid):
        new_params, new_stats, new_opt, loss, metrics = base(
            params, batch_stats, opt_state, images, targets, target_valid)
        n = n_updates + 1
        new_ema = ema_update(ema_params, new_params, n.astype(jnp.float32), cfg)
        return new_params, new_stats, new_opt, new_ema, n, loss, metrics

    return step


def sharded_det_train_step(state: Dict[str, Any], mesh):
    """Data-parallel detector fine-tuning over a device mesh: params /
    batch_stats / optimizer state replicated, the image + target batch
    sharded over the 'data' axis (XLA inserts the gradient psum). Returns
    (jitted step, placed (params, batch_stats, opt_state)) — the detection
    twin of arcface.sharded_train_step."""
    from jax.sharding import NamedSharding, PartitionSpec as PS

    step = make_det_train_step(state)
    repl = NamedSharding(mesh, PS())
    params = jax.device_put(state["params"], repl)
    batch_stats = jax.device_put(state["batch_stats"], repl)
    opt_state = jax.device_put(state["opt_state"], repl)
    jstep = jax.jit(
        step,
        in_shardings=(
            jax.tree_util.tree_map(lambda x: x.sharding, params),
            jax.tree_util.tree_map(lambda x: x.sharding, batch_stats),
            jax.tree_util.tree_map(lambda x: x.sharding, opt_state),
            NamedSharding(mesh, PS("data", None, None, None)),
            NamedSharding(mesh, PS("data", None, None)),
            NamedSharding(mesh, PS("data", None)),
        ),
    )
    return jstep, (params, batch_stats, opt_state)
