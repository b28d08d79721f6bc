"""Test environment: force the CPU backend with 8 fake devices so the
distributed paths (mesh, shard_map, halo exchange) are testable without a
TPU pod (SURVEY.md §5.0). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend regardless of the
# JAX_PLATFORMS env var; the config update below wins over it.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the test suite is compile-bound on this
# 1-vCPU box; caching XLA executables across runs cuts reruns from minutes
# to seconds.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpustereo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tpustereo.data.synthetic import synthetic_pair  # noqa: E402


@pytest.fixture(scope="session")
def small_pair():
    """A small slanted-plane pair shared across tests (H=48, W=64)."""
    return synthetic_pair((48, 64), disparity=6.0, slope=0.05, seed=7)


@pytest.fixture(scope="session")
def const_pair():
    """Constant-disparity pair: exact analytic ground truth d=8."""
    return synthetic_pair((48, 64), disparity=8.0, slope=0.0, seed=11)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
