"""Test env: force JAX onto a virtual 8-device CPU platform BEFORE jax import
so sharding/mesh tests run without TPU hardware (SURVEY.md §4 test plan)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU: this machine routes jax to the remote TPU via the experimental
# 'axon' platform, and a site hook forces jax_platforms="axon,cpu" so the
# JAX_PLATFORMS env var is IGNORED.  Unit tests must never run ops through
# the TPU tunnel (intermittent multi-minute stalls); pin via config instead.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native feature parser in-place once if it is missing, so the
# native tests run (not skip) and parity vs the Python path is always
# exercised.  `pip install` builds it via setup.py ext_modules; this covers
# the run-from-checkout dev flow.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
try:
    import deepsignal_tpu._fastparse  # noqa: F401
    import deepsignal_tpu._featkernel  # noqa: F401
except ImportError:
    import subprocess
    import sys
    subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=_REPO, check=False, capture_output=True, timeout=300)

# Persistent compilation cache: the full-size model takes minutes to compile
# on CPU; cache makes repeat test runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
