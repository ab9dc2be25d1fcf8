"""Sharding rules: data-parallel inference and sharded similarity matmuls.

This is the NCCL/gRPC-free scaling layer (SURVEY.md §2.7): replicated params,
batch axis sharded over the mesh's "data" axis, reference-embedding matrices
sharded over "model" for the similarity engine. XLA inserts the collectives
(psum/all-gather over ICI) from the sharding annotations alone.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over ``axis``, replicate the rest."""
    return NamedSharding(mesh, PS(axis, *([None] * (ndim - 1))))


def put_global(array: Any, sharding: NamedSharding) -> jax.Array:
    """``device_put`` that also works when the sharding spans PROCESSES.

    Single-process meshes take the fast path. On a multi-process mesh
    (DCN between TPU hosts; the 2-process gloo mesh in tests) every
    process must pass the SAME global host array — each donates only its
    addressable shards via ``make_array_from_callback``, exactly how
    multi-host input pipelines feed pjit programs."""
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    arr = np.asarray(array)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (model params) across the mesh — including
    meshes spanning processes (see :func:`put_global`)."""
    repl = NamedSharding(mesh, PS())
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)
    return jax.tree_util.tree_map(lambda x: put_global(x, repl), tree)


def data_parallel(
    fn: Callable, mesh: Mesh, axis: str = "data"
) -> Callable:
    """Wrap a jitted ``fn(variables, batch, ...)`` so the batch is sharded
    over the mesh data axis and variables are replicated.

    The returned function takes (variables, batch) with batch dim 0 divisible
    by the axis size; outputs keep the batch sharding.
    """

    def wrapped(variables, batch, *args):
        variables = replicate_to_mesh(variables, mesh)
        # put_global, not device_put: on meshes spanning processes each
        # host owns only its addressable shard (advisor r4 finding #3 —
        # keeps data_parallel consistent with the rest of the module's
        # multi-process support)
        batch = put_global(batch, batch_sharding(mesh, batch.ndim, axis))
        return fn(variables, batch, *args)

    return wrapped


def shard_reference_matrix(refs, mesh: Mesh, axis: str = "model"):
    """Shard an [M, D] reference-embedding matrix over classes/rows (TP for
    the similarity engine's E @ refs.T matmul)."""
    return jax.device_put(refs, NamedSharding(mesh, PS(axis, None)))
