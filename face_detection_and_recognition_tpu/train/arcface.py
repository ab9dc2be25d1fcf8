"""ArcFace training for the MobileFaceNet embedder, sharded over a mesh.

The reference defines the ArcFace head but never trains it
(``modules/mobile_facenet/mobile_facenet.py:160-201``; SURVEY.md §2.6 notes
no train.py exists). Here training is a first-class subsystem: the embedder
runs data-parallel over the mesh "data" axis while the ArcFace class kernel
[D, C] is TENSOR-PARALLEL over the "model" axis (class-sharded logits —
the classic large-class-count face-recognition layout). XLA derives the
cross-shard softmax collectives (max/sum psum over ICI) from the sharding
annotations on the kernel alone.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from ..models.mobile_facenet import MobileFaceNet, arcface_logits
from .detection import decay_mask


@dataclasses.dataclass
class ArcFaceTrainConfig:
    num_classes: int = 512
    embedding_size: int = 512
    s: float = 64.0
    m: float = 0.5
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 5e-4
    dtype: Any = jnp.float32
    # embedder architecture: "mobile_facenet" (512-d, 112px) or "facenet"
    # (InceptionResNetV1 128-d, 160px — the keras SavedModel slot)
    embedder: str = "mobile_facenet"
    # center-loss weight: pulls embeddings toward their batch class mean.
    # ArcFace CE saturates to 0 on few-identity data, leaving zero pressure
    # on intra-class compactness — which is exactly the statistic the
    # similar-face filter thresholds (max distance from the class mean)
    center_gain: float = 0.0


def create_train_state(
    cfg: ArcFaceTrainConfig, rng: jax.Array, image_hw: Tuple[int, int] = None
) -> Dict[str, Any]:
    """Initialize embedder variables + class kernel + optimizer state."""
    if cfg.embedder in ("facenet", "facenet-512"):
        from ..models.facenet import InceptionResNetV1

        net = InceptionResNetV1(embedding_size=cfg.embedding_size,
                                dtype=cfg.dtype)
        image_hw = image_hw or (160, 160)
    elif cfg.embedder == "reid-mnv2":
        from ..models.embedders import MobileNetV2Embedder

        net = MobileNetV2Embedder(embedding_size=cfg.embedding_size,
                                  dtype=cfg.dtype)
        image_hw = image_hw or (128, 128)
    else:
        net = MobileFaceNet(embedding_size=cfg.embedding_size,
                            dtype=cfg.dtype)
        image_hw = image_hw or (112, 112)
    r1, r2 = jax.random.split(rng)
    variables = jax.jit(net.init, static_argnames=('train',))(
        r1, jnp.zeros((1, *image_hw, 3), jnp.float32), train=True
    )
    kernel = jax.random.uniform(
        r2, (cfg.embedding_size, cfg.num_classes), jnp.float32, -1.0, 1.0
    )
    params = {"net": variables["params"], "arcface_kernel": kernel}
    tx = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask),
        optax.sgd(cfg.lr, momentum=cfg.momentum),
    )
    return {
        "params": params,
        "batch_stats": variables["batch_stats"],
        "opt_state": tx.init(params),
        "tx": tx,
        "net": net,
        "cfg": cfg,
    }


def make_train_step(state: Dict[str, Any]):
    """Pure jittable train_step((params, batch_stats, opt_state), images,
    labels) -> (new..., loss)."""
    net: MobileFaceNet = state["net"]
    cfg: ArcFaceTrainConfig = state["cfg"]
    tx = state["tx"]

    def loss_fn(params, batch_stats, images, labels):
        emb, updates = net.apply(
            {"params": params["net"], "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        logits = arcface_logits(
            emb, labels, params["arcface_kernel"], s=cfg.s, m=cfg.m
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        if cfg.center_gain > 0.0:
            # batch class means via one segment mean (stop-grad centers)
            onehot = jax.nn.one_hot(labels, cfg.num_classes)      # [B, C]
            counts = jnp.maximum(onehot.sum(0), 1.0)              # [C]
            centers = (onehot.T @ emb) / counts[:, None]          # [C, D]
            centers = jax.lax.stop_gradient(centers)
            d2 = jnp.sum((emb - centers[labels]) ** 2, axis=-1)
            loss = loss + cfg.center_gain * d2.mean()
        return loss, updates["batch_stats"]

    def train_step(params, batch_stats, opt_state, images, labels):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, labels
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt, loss

    return train_step


def shard_train_state(state: Dict[str, Any], mesh: Mesh):
    """DP + TP placement: everything replicated except the ArcFace kernel,
    which is class-sharded over the 'model' axis."""
    repl = NamedSharding(mesh, PS())
    kernel_sh = NamedSharding(mesh, PS(None, "model"))

    params = dict(state["params"])
    params["net"] = jax.device_put(params["net"], repl)
    params["arcface_kernel"] = jax.device_put(params["arcface_kernel"], kernel_sh)
    batch_stats = jax.device_put(state["batch_stats"], repl)

    # momentum buffers mirror the param placement. Matched by TREE PATH, not
    # shape: optimizer state mirrors the param tree, so the kernel's own
    # leaves carry 'arcface_kernel' in their path — a square embedder kernel
    # that merely coincides with the ArcFace kernel's shape must stay
    # replicated like its parameter (shape matching would silently
    # class-shard its momentum against a replicated param)
    def opt_sharding(path, leaf):
        in_path = any(
            getattr(p, "key", getattr(p, "name", None)) == "arcface_kernel"
            for p in path)
        return jax.device_put(leaf, kernel_sh if in_path else repl)

    opt_state = jax.tree_util.tree_map_with_path(
        opt_sharding, state["opt_state"]
    )
    return params, batch_stats, opt_state


def sharded_train_step(state: Dict[str, Any], mesh: Mesh):
    """Return (jitted step, placed (params, batch_stats, opt_state)).

    Batch inputs must be placed with dim 0 sharded over 'data'
    (parallel.sharding.batch_sharding).
    """
    step = make_train_step(state)
    params, batch_stats, opt_state = shard_train_state(state, mesh)
    data_sh = NamedSharding(mesh, PS("data"))
    jstep = jax.jit(
        step,
        in_shardings=(
            jax.tree_util.tree_map(lambda x: x.sharding, params),
            jax.tree_util.tree_map(lambda x: x.sharding, batch_stats),
            jax.tree_util.tree_map(lambda x: x.sharding, opt_state),
            NamedSharding(mesh, PS("data", None, None, None)),
            data_sh,
        ),
    )
    return jstep, (params, batch_stats, opt_state)
