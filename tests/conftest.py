"""Test configuration: force an 8-device virtual CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on a
virtual CPU mesh exactly as recommended for JAX multi-host development.
Env vars must be set before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's axon TPU plugin overrides JAX_PLATFORMS, so force the CPU
# backend through the config API (env vars alone are not honored).
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: model-heavy tests recompile identical graphs on
# every run otherwise (the 1-core host makes XLA compiles the suite's cost)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# bit-parity tests vs torch/numpy references need true f32 convs/matmuls;
# jax's default precision uses fast bf16-accumulation passes even on CPU.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope="session")
def test_image_3faces():
    """The reference's golden 3-face test image, if present."""
    import cv2

    path = "tests/data/test2_faces_3.jpg"
    if not os.path.exists(path):
        pytest.skip("golden test image not available")
    return cv2.imread(path)


@pytest.fixture(scope="session")
def test_image_0faces():
    import cv2

    path = "tests/data/test1_faces_0.jpg"
    if not os.path.exists(path):
        pytest.skip("golden test image not available")
    return cv2.imread(path)
