"""Tracing / profiling utilities.

The reference only had ad-hoc time.time() FPS prints and a CUDA-synchronized
timer (SURVEY.md §5). Here profiling is structured: jax.profiler traces for
XLA-level analysis plus a lightweight stage timer for pipeline runners.

NOTE (axon/tunneled TPU): ``jax.block_until_ready`` does not actually wait on
the tunneled platform — timing helpers here force completion by fetching a
scalar from the result tree.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List

import jax
import numpy as np


def force_completion(tree: Any) -> None:
    """Fetch one scalar so all queued device work is provably finished."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.numpy.ravel(leaves[0])[0])


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context — view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating per-stage wall-clock timer for pipeline runners."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                force_completion(result)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> List[str]:
        out = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            n = self.counts[name]
            t = self.totals[name]
            out.append(f"{name}: total {t:.3f}s, {n} calls, "
                       f"{1e3 * t / n:.2f} ms/call")
        return out


def throughput(fn, *args, iters: int = 20, items_per_call: int = 1,
               warmup: int = 1) -> float:
    """Items/second with queue-depth dispatch and fetch-based completion."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    force_completion(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_completion(out)
    return iters * items_per_call / (time.perf_counter() - t0)
