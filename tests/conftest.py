"""Test env: force JAX onto a virtual 8-device CPU platform BEFORE jax import
so sharding/mesh tests run without TPU hardware (SURVEY.md §4 test plan)."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the real TPU
# behind a network tunnel); unit tests must never run ops through it.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the full-size model takes minutes to compile
# on CPU; cache makes repeat test runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
