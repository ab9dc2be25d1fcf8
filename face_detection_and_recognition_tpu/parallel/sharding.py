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


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (model params) across the mesh."""
    repl = NamedSharding(mesh, PS())
    return jax.device_put(tree, repl)


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
        batch = jax.device_put(batch, batch_sharding(mesh, batch.ndim, axis))
        return fn(variables, batch, *args)

    return wrapped


def shard_reference_matrix(refs, mesh: Mesh, axis: str = "model"):
    """Shard an [M, D] reference-embedding matrix over classes/rows (TP for
    the similarity engine's E @ refs.T matmul)."""
    return jax.device_put(refs, NamedSharding(mesh, PS(axis, None)))
