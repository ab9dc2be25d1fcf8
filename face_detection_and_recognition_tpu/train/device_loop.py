"""Device-resident training loop: the whole dataset lives in HBM and many
optimizer steps run as ONE jitted ``lax.scan`` program.

Why: the reference's (vendored, dead) training stack streams batches from a
host dataloader every step (``pytorch/utils/face_datasets.py``); a straight
translation is tunnel-bound here — a 16×640² uint8 batch per step through
the host↔TPU link caps training at ~0.25 steps/s while the chip idles.
TPU-first, the golden/fine-tune datasets are tiny (hundreds of MB), so:

1. pre-generate an augmented example buffer ONCE on the host (mosaic / HSV /
   flip from train/data.py) and ``device_put`` it as uint8 — a single upload;
2. each scan step samples a batch by PRNG index gather ON DEVICE, applies
   cheap per-step augmentation (horizontal flip with landmark mirror+swap,
   brightness jitter) on device, and runs the fused train step;
3. the host sees one dispatch per ``chunk_steps`` steps (metrics come back
   chunk-averaged), so step time is pure device compute.

Works with any step of the shared family signature
``step(params, batch_stats, opt_state, ema, n, images_u8, targets, valid)``
(train/detection.make_det_train_step_ema, train/ssd.make_ssd_train_step_ema).
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# landmark column permutation (within the 10-wide lmk block) applied after an
# x-mirror: left eye <-> right eye, left mouth corner <-> right mouth corner
# (train/data.flip_lr_targets, reference face_datasets.py:419-442)
_LMK_LR_PERM = jnp.asarray([2, 3, 0, 1, 4, 5, 8, 9, 6, 7])


def build_example_buffer(
    index: List[Tuple[str, np.ndarray]],
    n_examples: int,
    out_wh: Tuple[int, int],
    max_targets: int,
    seed: int = 0,
    augment=None,
    to_rgb: bool = True,
    cache_mb: float = 1200.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pre-generate ``n_examples`` augmented examples as stacked host arrays
    (images uint8 [K,h,w,3], targets [K,T,14], valid [K,T]) ready for one
    ``jax.device_put``. Reuses the streaming pipeline's mosaic/HSV/flip."""
    from .data import wider_batches

    it = wider_batches(
        index, batch_size=n_examples, out_wh=out_wh, max_targets=max_targets,
        seed=seed, epochs=10_000, augment=augment, as_uint8=True,
        cache_mb=cache_mb, to_rgb=to_rgb)
    x, t, v = next(it)
    it.close()
    return x, t, v


def device_flip_lr(
    key: jax.Array, x: jnp.ndarray, t: jnp.ndarray, prob: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-example horizontal flip on device.

    x: [B,h,w,3] (any dtype); t: [B,T,14] pixel rows [cx,cy,w,h,lmk x10]
    (-1 = invisible landmark). Mirrors cx and visible landmark xs about the
    image width and swaps left/right landmark slots, matching the host-side
    ``train.data.flip_lr_targets`` convention (cx -> W - cx)."""
    b = x.shape[0]
    w = float(x.shape[2])
    mask = jax.random.uniform(key, (b,)) < prob
    xf = jnp.where(mask[:, None, None, None], x[:, :, ::-1, :], x)
    cx = jnp.where(mask[:, None], w - t[..., 0], t[..., 0])
    lmk = t[..., 4:14]
    xs = lmk[..., 0::2]
    xs_m = jnp.where(xs < 0, -1.0, w - xs)
    lmk_m = lmk.at[..., 0::2].set(xs_m)[..., _LMK_LR_PERM]
    lmk = jnp.where(mask[:, None, None], lmk_m, lmk)
    tf = jnp.concatenate([cx[..., None], t[..., 1:4], lmk], axis=-1)
    return xf, tf


def device_brightness(key: jax.Array, x_u8: jnp.ndarray,
                      jitter: float) -> jnp.ndarray:
    """Per-example brightness scale U(1-j, 1+j) on a uint8 batch (the cheap
    on-device slice of HSV-V jitter; hue/sat ran at buffer-build time)."""
    b = x_u8.shape[0]
    g = jax.random.uniform(key, (b, 1, 1, 1), minval=1.0 - jitter,
                           maxval=1.0 + jitter)
    return jnp.clip(x_u8.astype(jnp.float32) * g, 0.0, 255.0).astype(jnp.uint8)


def make_chunk_trainer(
    step_fn: Callable,
    batch_size: int,
    chunk_steps: int,
    flip_lr: float = 0.5,
    brightness: float = 0.0,
    ema_stats_cfg: Optional[Tuple[float, float]] = None,
    mesh=None,
):
    """Wrap a train step into a jitted ``chunk`` running ``chunk_steps``
    optimizer steps on device-resident data.

    chunk(params, batch_stats, opt_state, ema, ema_stats, n, rng, data_x,
    data_t, data_v) -> (params, batch_stats, opt_state, ema, ema_stats, n,
    rng, loss_mean, metrics_mean). Model/optimizer buffers are donated
    (updated in place in HBM); the data buffers are not.

    ``ema_stats_cfg=(decay, tau)`` additionally EMAs the BatchNorm running
    stats with the same ramped decay the params EMA uses — the reference's
    ModelEMA averages ALL floating buffers including BN running stats
    (pytorch/utils/torch_utils.py:262-283); EMA'd params paired with the
    LIVE net's running stats are a mismatched network and evaluate
    near-randomly.

    ``mesh``: a jax.sharding.Mesh with a 'data' axis — each step's sampled
    batch is sharding-constrained over it, so XLA runs the model
    data-parallel and inserts the gradient psum (weights stay replicated;
    place them with replicate_to_mesh first). ``batch_size`` must divide
    the data axis."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as PS

        batch_sharding = (
            NamedSharding(mesh, PS("data", None, None, None)),
            NamedSharding(mesh, PS("data", None, None)),
            NamedSharding(mesh, PS("data", None)),
        )

    def chunk(params, batch_stats, opt_state, ema, ema_stats, n, rng,
              data_x, data_t, data_v):
        k = data_x.shape[0]

        def body(carry, _):
            params, bstats, opt, ema, ema_stats, n, rng = carry
            rng, k_idx, k_flip, k_bri = jax.random.split(rng, 4)
            idx = jax.random.randint(k_idx, (batch_size,), 0, k)
            x = jnp.take(data_x, idx, axis=0)
            t = jnp.take(data_t, idx, axis=0)
            v = jnp.take(data_v, idx, axis=0)
            if flip_lr > 0.0:
                x, t = device_flip_lr(k_flip, x, t, flip_lr)
            if brightness > 0.0:
                x = device_brightness(k_bri, x, brightness)
            if mesh is not None:
                x = jax.lax.with_sharding_constraint(x, batch_sharding[0])
                t = jax.lax.with_sharding_constraint(t, batch_sharding[1])
                v = jax.lax.with_sharding_constraint(v, batch_sharding[2])
            params, bstats, opt, ema, n, loss, metrics = step_fn(
                params, bstats, opt, ema, n, x, t, v)
            if ema_stats_cfg is not None:
                # the SAME ramp as the params EMA (detection.ema_update):
                # a shared helper keeps the BN-stats shadow from drifting
                # out of sync with the params shadow
                from .detection import ema_update_ramped

                decay, tau = ema_stats_cfg
                ema_stats = ema_update_ramped(
                    ema_stats, bstats, n.astype(jnp.float32), decay, tau)
            else:
                ema_stats = bstats
            return (params, bstats, opt, ema, ema_stats, n, rng), \
                (loss, metrics)

        carry, (losses, metrics) = jax.lax.scan(
            body, (params, batch_stats, opt_state, ema, ema_stats, n, rng),
            None, length=chunk_steps)
        params, batch_stats, opt_state, ema, ema_stats, n, rng = carry
        loss_mean = jnp.mean(losses)
        metrics_mean = jax.tree_util.tree_map(jnp.mean, metrics)
        return (params, batch_stats, opt_state, ema, ema_stats, n, rng,
                loss_mean, metrics_mean)

    return jax.jit(chunk, donate_argnums=(0, 1, 2, 3, 4))


def run_device_training(
    state: Dict,
    make_step: Callable,
    data: Tuple[np.ndarray, np.ndarray, np.ndarray],
    batch_size: int,
    max_steps: int,
    chunk_steps: int = 100,
    seed: int = 0,
    flip_lr: float = 0.5,
    brightness: float = 0.2,
    on_eval: Optional[Callable[[int, Dict, Dict], bool]] = None,
    eval_every: int = 200,
    ema_cfg: Tuple[float, float] = (0.999, 500.0),
    mesh=None,
    log=print,
) -> Dict:
    """Drive chunked device training to ``max_steps``.

    ``on_eval(step, ema_variables, live_variables)`` is called every
    ``eval_every`` steps (rounded up to chunk boundaries) with BOTH weight
    candidates as host-side variables dicts (each a matched params +
    batch_stats pair); returning True stops training early. Returns the
    final state dict (params/batch_stats/ema_params/ema_batch_stats/
    opt_state updated)."""
    x, t, v = data
    data_x = jax.device_put(np.ascontiguousarray(x))
    data_t = jax.device_put(np.ascontiguousarray(t.astype(np.float32)))
    data_v = jax.device_put(np.ascontiguousarray(v))
    log(f"[device-loop] buffer resident: {data_x.nbytes / 1e6:.0f} MB images,"
        f" {data_x.shape[0]} examples")

    chunk = make_chunk_trainer(make_step(state), batch_size, chunk_steps,
                               flip_lr=flip_lr, brightness=brightness,
                               ema_stats_cfg=ema_cfg, mesh=mesh)
    p, bs = state["params"], state["batch_stats"]
    opt, ema = state["opt_state"], state["ema_params"]
    ema_bs = state.get("ema_batch_stats") or jax.tree_util.tree_map(
        jnp.copy, bs)
    if mesh is not None:
        # weights/optimizer replicated over the mesh; XLA shards each step's
        # batch (constraint in the chunk) and psums the gradients
        from ..parallel.sharding import replicate_to_mesh

        p, bs, opt, ema, ema_bs = replicate_to_mesh(
            (p, bs, opt, ema, ema_bs), mesh)
    n = jnp.int32(state.get("n_updates", 0))
    rng = jax.random.PRNGKey(seed ^ 0x5EED)
    done = 0
    eval_mark = 0
    while done < max_steps:
        steps = min(chunk_steps, max_steps - done)
        if steps != chunk_steps:
            # tail chunk: fresh jit at the smaller static length (same mesh —
            # dropping it here would silently de-shard the final DP steps)
            chunk = make_chunk_trainer(
                make_step(state), batch_size, steps,
                flip_lr=flip_lr, brightness=brightness, ema_stats_cfg=ema_cfg,
                mesh=mesh)
        p, bs, opt, ema, ema_bs, n, rng, loss, metrics = chunk(
            p, bs, opt, ema, ema_bs, n, rng, data_x, data_t, data_v)
        done += steps
        log(f"[device-loop] step {done} loss {float(loss):.4f} "
            + " ".join(f"{k} {float(val):.3f}"
                       for k, val in sorted(metrics.items())))
        if on_eval is not None and done - eval_mark >= eval_every:
            eval_mark = done
            ema_vars = {"params": jax.device_get(ema),
                        "batch_stats": jax.device_get(ema_bs)}
            live_vars = {"params": jax.device_get(p),
                         "batch_stats": jax.device_get(bs)}
            if on_eval(done, ema_vars, live_vars):
                break
    state.update(params=p, batch_stats=bs, opt_state=opt, ema_params=ema,
                 ema_batch_stats=ema_bs, n_updates=int(n))
    return state
