"""Trace-time backend dispatch, shared by every kernel-selection site.

Kernel choices (pallas vs jnp fallbacks, gather vs GEMM crops, micro-batch
sizing) branch on the execution backend at TRACE time — the decision is
baked into the compiled program, so one helper keeps the idiom in a single
place for every call site.
"""
import jax


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU device."""
    return jax.devices()[0].platform == "tpu"
