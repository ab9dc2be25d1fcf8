"""Device mesh construction.

The reference has no multi-device layer at all (SURVEY.md §2.7) — its only
cross-process boundary is a gRPC link to a Triton sidecar. Here scaling is
first-class: a ``jax.sharding.Mesh`` over TPU chips, with the batch ("data")
axis carrying images/frames/crops and an optional "model" axis for sharded
classifier/similarity matmuls. Collectives ride ICI within a slice and DCN
across slices; ``jax.distributed.initialize`` extends the same program to
multi-host.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Args:
        axes: axis names, e.g. ("data",) or ("data", "model").
        shape: explicit axis sizes; default puts all devices on the first
            axis and 1 on the rest.
        devices: device list override (defaults to jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_cpu_devices: Optional[int] = None) -> None:
    """Multi-host bring-up (DCN across slices). No-op when single-process.

    ``local_cpu_devices`` switches to CPU-simulation mode: each process owns
    that many virtual CPU devices and cross-process collectives run through
    the distributed runtime's gloo backend — the same program shape as a
    multi-host TPU pod, executable on one machine (tests/test_multiprocess.py
    runs a DP+TP ArcFace step across two such processes). Must be called
    before any computation; the config updates (not the JAX_PLATFORMS env
    var, which this image's axon TPU plugin overrides) are what force the
    CPU backend."""
    if num_processes is None or num_processes <= 1:
        return
    if local_cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(local_cpu_devices))
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
