"""Train the reference's REAL OpenVINO topologies — through the IR
interpreter itself.

``models/ov_graph.OVGraphNet`` executes IR layer tables as pure jnp, which
makes the interpreter differentiable: this module trains the EXACT
face-detection-0204 / face-detection-retail-0004 graph tables
(``models/ov_topologies.py``) directly with the same MultiBox loss as the
flax SSD family (``train/ssd.py``) — the caffe-interpreter move
(``train/caffe_golden.py``) repeated for OpenVINO. The trained weight dict
then exports as a REAL ``model.xml`` + ``model.bin`` pair
(``ov_topologies.export_trained_ir``), so the file-executor import path
the reference artifact would exercise (``engine.load_weights('*.xml')`` →
``OVGraphNet`` from the file's own embedded graph) fires on a real
artifact with executed pixel accuracy.

Reference: ``modules/openvino/model.py:21`` (``core.read_model(xml,bin)``)
loads face_detection_0204/model.xml — the artifact class this loop
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
from .ssd import encode_ssd_targets, ssd_multibox_loss


@dataclasses.dataclass(frozen=True)
class OVGoldenConfig:
    topology: str = "ov-0204"
    input_size: Tuple[int, int] = (448, 448)
    max_targets: int = 8
    iou_pos: float = 0.5
    neg_ratio: int = 3
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
        return self.topology


def create_ov_train_state(cfg: OVGoldenConfig,
                          rng: jax.Array) -> Dict[str, Any]:
    from ..models.ov_graph import OVGraphNet
    from ..models.ov_topologies import build_ov_topology

    seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
    net = OVGraphNet(build_ov_topology(cfg.topology, seed=seed))
    ih, iw = net.input_dims[2], net.input_dims[3]
    if (iw, ih) != cfg.input_size:
        raise ValueError(
            f"{cfg.topology} runs its fixed {iw}x{ih} graph — pass "
            f"--size {iw}")
    corners = np.asarray(net.priors, np.float32)             # [N, 4] xyxy
    priors = np.stack([
        (corners[:, 0] + corners[:, 2]) / 2,
        (corners[:, 1] + corners[:, 3]) / 2,
        corners[:, 2] - corners[:, 0],
        corners[:, 3] - corners[:, 1],
    ], axis=1)
    variances = np.asarray(net.prior_variances, np.float32)
    assert np.allclose(variances, variances[0]), "non-uniform prior variances"

    # decay multiplicative kernels only (conv/matmul weights, ndim >= 2);
    # bias consts [1,C,1,1] are ndim 4, so mask by name instead
    decay = {k: (np.ndim(v) >= 2 and not k.endswith("/bias"))
             for k, v in net.weights.items()}
    # Adam, not the family-standard SGD: these IR graphs carry NO
    # normalization layers (real IRs ship BN folded into convs), and a
    # 20-deep plain net under SGD plateaus immediately (loss froze at 4.1
    # for 8000 steps). Clipping is PER LEAF (block RMS), never global:
    # conv1's gradient rides the raw-BGR input scale (dL/dW ~ 115x other
    # layers, measured norm 3406 vs ~10), so a global-norm clip silently
    # rescales every OTHER layer's gradient by ~0.003 — that plateaued
    # ov-0204 twice. Per-leaf RMS tames conv1 and loss spikes (an
    # unclipped SGD step NaN'd a run) without touching healthy layers.
    tx = optax.chain(
        optax.clip_by_block_rms(1.0),
        optax.add_decayed_weights(cfg.weight_decay, mask=decay),
        optax.adam(lr_schedule(cfg)),
    )
    params = {k: jnp.asarray(v) for k, v in net.weights.items()}
    return {
        "net": net, "cfg": cfg, "tx": tx,
        "priors": jnp.asarray(priors),
        "variances": tuple(float(v) for v in variances[0]),
        "params": params,
        "batch_stats": {},          # stat-less family contract (blazeface)
        "opt_state": tx.init(params),
        "ema_params": jax.tree_util.tree_map(jnp.copy, params),
    }


def make_ov_train_step_ema(state: Dict[str, Any]):
    """Family-agnostic step signature (train/ssd.py): step(params,
    batch_stats, opt_state, ema, n, images, targets, valid).

    images: [B, H, W, 3] uint8 BGR (the OVModel convention — pad_resize
    then RAW BGR values, no mean subtraction: ``openvino/model.py:44-49``);
    targets [B, T, 14] pixel cxcywh rows (landmarks ignored)."""
    net = state["net"]
    cfg: OVGoldenConfig = state["cfg"]
    tx = state["tx"]
    priors = state["priors"]
    variances = state["variances"]
    w, h = cfg.input_size
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    n_priors = priors.shape[0]

    def loss_fn(params, images, targets, target_valid):
        # raw BGR, no mean subtraction (the OVModel convention). The
        # optimization_barrier is load-bearing: without it the raw
        # convert(u8)->conv1 pattern sends XLA:TPU's space-to-batch pass
        # down a backprop-filter propagation path that CHECK-fails
        # ("select f32 vs u8", space_to_batch_converter.cc:2011). The
        # barrier blocks that propagation with zero semantic change —
        # the mean-subtracting SSD families never hit this because the
        # subtract already separates convert from conv.
        x = jax.lax.optimization_barrier(images.astype(jnp.float32))
        env = net.apply(params, x,
                        taps=("mbox_loc_flat", "mbox_conf_reshape"))
        b = images.shape[0]
        # the IR Reshape targets are batch-1 literals ([1,-1,...]) so the
        # taps fold batch into the flat axis — restore [B, N, .] here
        locs = env["mbox_loc_flat"].astype(jnp.float32).reshape(
            b, n_priors, 4)
        conf = env["mbox_conf_reshape"].astype(jnp.float32).reshape(
            b, n_priors, 2)  # PRE-softmax logits
        gt = targets[..., :4] / scale
        loc_t, pos = encode_ssd_targets(
            priors, gt, target_valid, variances, cfg.iou_pos)
        return ssd_multibox_loss(
            locs, conf, loc_t, pos, cfg.neg_ratio, cfg.loc_gain)

    def step(params, batch_stats, opt_state, ema, n, images, targets, valid):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, targets, valid)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        n = n + 1
        new_ema = ema_update_ramped(ema, new_params, n.astype(jnp.float32),
                                    cfg.ema_decay, cfg.ema_tau)
        return new_params, batch_stats, new_opt, new_ema, n, loss, metrics

    return step
