"""Train the EXACT public res10_300x300 deploy graph — through the
caffe graph interpreter itself.

``models/caffe_ssd.CaffeGraphNet`` executes caffe layer tables as pure
jnp, which makes the interpreter differentiable: this module trains the
REAL deploy topology (``models/res10.res10_deploy_defs``) directly with
the same MultiBox loss as the flax SSD family (``train/ssd.py``). The
trained blob dict then round-trips through a REAL binary ``.caffemodel``
(``utils/caffe_graph.write_caffemodel_graph``), so both import paths the
reference artifact would exercise — the strict name/shape blob pour and
the file-embedded-graph executor (``models/res10.build_res10_from_caffemodel``)
— fire on a real artifact with executed pixel accuracy, not just on
synthetic fixtures.

Training conventions for the interpreter:

* caffe ``BatchNorm`` blobs are inference STATISTICS (mean/var/scale
  factor), not learnables — they stay frozen at their identity init
  (mean 0, var 1, sf 1); the following ``Scale`` layers carry the
  learnable affine, exactly how caffe fine-tuning freezes BN;
* weight decay applies to multiplicative kernels only (ndim >= 2),
  mirroring the reference recipe (train.py param groups).

Reference: ``modules/opencv2_dnn/model.py:21`` loads
res10_300x300_ssd_iter_140000.caffemodel — the artifact class this loop
produces a synthetic twin of.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .detection import ema_update_ramped, lr_schedule
from .ssd import OPENCV_SSD_MEAN, encode_ssd_targets, ssd_multibox_loss


@dataclasses.dataclass(frozen=True)
class CaffeGoldenConfig:
    input_size: Tuple[int, int] = (300, 300)
    max_targets: int = 8
    # 0.35, not the SSD paper's 0.5: the deploy graph's prior ladder is
    # SPEC-pinned at min 30px, but the golden faces land at 18-19px at the
    # 300px input — IoU(18px face, 30px prior) = 0.36, so at 0.5 each
    # small face matches only its single bipartite-forced prior and the
    # 8000-step run learned the big face alone. 0.35 gives the small
    # faces a positive set without touching the graph.
    iou_pos: float = 0.35
    # 7:1, not the SSD paper's 3:1 — the 0.35 matching above admits
    # lower-quality positives, and at 3:1/5:1 the trained net cleared all
    # three golden boxes (0.93/0.85/0.80) but kept firing false alarms on
    # the 0-face negative; the low-lr polish resume with heavier mining
    # buys the clean negative back without disturbing the boxes
    neg_ratio: int = 7
    loc_gain: float = 1.0
    lr: float = 0.002
    momentum: float = 0.9
    weight_decay: float = 5e-4
    lrf: float = 0.1
    warmup_steps: int = 0
    total_steps: int = 0
    ema_decay: float = 0.999
    ema_tau: float = 500.0

    @property
    def arch(self):
        return "res10-ssd"


def _blob_masks(net, weights):
    """(decay_mask, bn_names): decay multiplicative kernels only; BN
    statistic blobs are frozen entirely."""
    bn_names = {s.name for s in net.steps if s.op == "batchnorm"}
    decay = {k: [bool(np.ndim(b) >= 2) and k not in bn_names for b in v]
             for k, v in weights.items()}
    return decay, bn_names


def _lsuv_rescale(net, weights, input_size, seed=0,
                  target_std=1.0) -> None:
    """LSUV init over EVERY conv layer of the deploy graph (in place).

    The deploy graph's BN is frozen at identity statistics, so nothing
    ever normalizes the raw ±120 mean-subtracted input scale: trunk
    activations run at std 50-130 end to end and the He-init heads emit
    O(50-100) conf LOGITS — a saturated softmax with no usable gradient
    (training froze at conf=0.5 for 8000 steps; per-head rescale alone
    still plateaued because the TRUNK's scale wrecks conditioning). LSUV
    (Mishkin & Matas 2015): forward a real-statistics batch, rescale each
    conv's kernel+bias so its output std is ~``target_std``, sequentially
    so each layer is measured against its already-rescaled upstream. Topology
    and weight SHAPES are untouched — this is still the exact public
    res10 deploy graph, only better-conditioned random init."""
    convs = [s for s in net.steps if s.op == "conv"]
    w, h = input_size
    x = jnp.asarray(
        np.random.RandomState(seed).randint(0, 255, (2, h, w, 3))
        .astype(np.float32) - np.asarray(OPENCV_SSD_MEAN, np.float32))
    # SEQUENTIAL, input to output: rescaling layer i changes every
    # downstream std by the same factor, so the all-at-once variant
    # compounds corrections and oscillates between inf and 0 — each layer
    # must be measured against its already-rescaled upstream (one forward
    # per conv; ~30 forwards once at state creation).
    for s in convs:
        std = float(jnp.std(net.apply(weights, x,
                                      taps=(s.output,))[s.output]))
        if np.isfinite(std) and std > 1e-12:
            g = float(np.clip(target_std / std, 1e-4, 1e4))
            weights[s.name] = [np.asarray(b, np.float32) * g
                               for b in weights[s.name]]


def apply_background_prior_bias(net, weights, logit: float = 2.0) -> None:
    """RetinaNet-style prior bias on the conf heads (in place): background
    +logit, face -logit per prior, so every prior STARTS at p(face)~0.02.

    Without it, hard-negative mining only ever touches the top
    ``neg_ratio * n_pos`` of 8732 priors per step — the long tail stays at
    its softmax-neutral init and a trained net shows a wall of ~0.5-conf
    junk that floods the gate band's 0.45 edge (res10 measured 64
    detections at dt<=0.5 with a PERFECT 3/0 result at dt>=0.6). Conf
    channel layout is (prior, class) with class 0 = background, so even
    channels get +logit, odd get -logit."""
    for s in net.steps:
        if s.op == "conv" and "mbox_conf" in s.name:
            blobs = [np.array(b, np.float32) for b in weights[s.name]]
            if len(blobs) > 1 and blobs[1].ndim == 1:
                blobs[1][0::2] += logit
                blobs[1][1::2] -= logit
                weights[s.name] = blobs


def create_res10_train_state(cfg: CaffeGoldenConfig,
                             rng: jax.Array) -> Dict[str, Any]:
    from ..models.res10 import build_res10

    net, weights, _ = build_res10(rng=rng)
    _lsuv_rescale(net, weights, cfg.input_size)
    apply_background_prior_bias(net, weights)
    net.weights = weights
    corners = np.asarray(net.priors, np.float32)             # [N, 4] xyxy
    priors = np.stack([
        (corners[:, 0] + corners[:, 2]) / 2,
        (corners[:, 1] + corners[:, 3]) / 2,
        corners[:, 2] - corners[:, 0],
        corners[:, 3] - corners[:, 1],
    ], axis=1)
    variances = np.asarray(net.prior_variances, np.float32)
    # encode_ssd_targets takes one variance 4-vector; res10's PriorBox
    # layers all carry (0.1, 0.1, 0.2, 0.2) — assert instead of assuming
    assert np.allclose(variances, variances[0]), "non-uniform prior variances"

    decay, bn_names = _blob_masks(net, weights)
    # Adam + PER-LEAF clipping, the no-normalization-training recipe
    # proven on the OV topologies (train/ov_golden.py): the deploy graph's
    # BN stays frozen at identity, so under SGD the deep plain chain
    # plateaus (conf logits froze at 0 for 8000 steps); conv1's gradient
    # rides the ±120 mean-subtracted input scale, so clipping must be per
    # leaf — a global-norm clip would crush every other layer with it.
    tx = optax.chain(
        optax.clip_by_block_rms(1.0),
        optax.add_decayed_weights(cfg.weight_decay, mask=decay),
        optax.adam(lr_schedule(cfg)),
    )
    params = {k: [jnp.asarray(b) for b in v] for k, v in weights.items()}
    return {
        "net": net, "cfg": cfg, "tx": tx,
        "priors": jnp.asarray(priors),
        "variances": tuple(float(v) for v in variances[0]),
        "bn_names": bn_names,
        "params": params,
        "batch_stats": {},          # stat-less family contract (blazeface)
        "opt_state": tx.init(params),
        "ema_params": jax.tree_util.tree_map(jnp.copy, params),
    }


def make_res10_train_step_ema(state: Dict[str, Any]):
    """Family-agnostic step signature (train/ssd.py): step(params,
    batch_stats, opt_state, ema, n, images, targets, valid).

    images: [B, 300, 300, 3] uint8 BGR (the OpenCV-SSD convention — NO
    RGB swap); targets [B, T, 14] pixel cxcywh rows (landmarks ignored)."""
    net = state["net"]
    cfg: CaffeGoldenConfig = state["cfg"]
    tx = state["tx"]
    priors = state["priors"]
    variances = state["variances"]
    bn_names = state["bn_names"]
    w, h = cfg.input_size
    mean = jnp.asarray(OPENCV_SSD_MEAN, jnp.float32)
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    n_priors = priors.shape[0]

    def loss_fn(params, images, targets, target_valid):
        x = images.astype(jnp.float32) - mean
        env = net.apply(params, x, taps=("mbox_loc", "mbox_conf_reshape"))
        b = images.shape[0]
        locs = env["mbox_loc"].astype(jnp.float32).reshape(b, n_priors, 4)
        conf = env["mbox_conf_reshape"].astype(jnp.float32)  # [B, N, 2] logits
        gt = targets[..., :4] / scale
        loc_t, pos = encode_ssd_targets(
            priors, gt, target_valid, variances, cfg.iou_pos)
        return ssd_multibox_loss(
            locs, conf, loc_t, pos, cfg.neg_ratio, cfg.loc_gain)

    def _freeze_bn(grads):
        return {k: ([jnp.zeros_like(g) for g in v] if k in bn_names else v)
                for k, v in grads.items()}

    def step(params, batch_stats, opt_state, ema, n, images, targets, valid):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, targets, valid)
        grads = _freeze_bn(grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        n = n + 1
        new_ema = ema_update_ramped(ema, new_params, n.astype(jnp.float32),
                                    cfg.ema_decay, cfg.ema_tau)
        return new_params, batch_stats, new_opt, new_ema, n, loss, metrics

    return step


def export_trained_caffemodel(weights: Dict[str, Any], path: str) -> None:
    """Write trained interpreter blobs into a REAL binary .caffemodel
    (full layer defs + blobs — the synthetic twin of a training snapshot),
    so ``engine.load_weights('*.caffemodel')`` and
    ``build_res10_from_caffemodel`` both fire on it."""
    from ..models.res10 import res10_deploy_defs
    from ..utils.caffe_graph import write_caffemodel_graph

    if isinstance(weights.get("params"), dict):
        weights = weights["params"]
    defs = res10_deploy_defs()
    for layer in defs:
        blobs = weights.get(layer.name)
        if blobs is not None:
            layer.blobs = [np.asarray(jax.device_get(b), np.float32)
                           for b in blobs]
    with open(path, "wb") as f:
        f.write(write_caffemodel_graph(defs))
