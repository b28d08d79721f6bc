"""Test environment: force the CPU backend with 8 fake devices so the
distributed paths (mesh, shard_map, halo exchange) are testable without a
TPU pod (SURVEY.md §5.0). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend regardless of the
# JAX_PLATFORMS env var; the config update below wins over it.
jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache that used to be enabled here is
# OFF deliberately. jaxlib's CPU executable serializer segfaults on this
# box for some executables (crash inside compilation_cache.
# put_executable_and_time, observed 2026-08-17 killing the suite at
# varying tests; its AOT loader also warns about machine-feature
# mismatches). Reruns pay full compiles (~15 min) but the suite is
# deterministic again.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tpustereo.data.synthetic import synthetic_pair  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables_between_modules():
    """jaxlib 0.9.0's CPU backend segfaults inside backend_compile_and_load
    once a process accumulates a few hundred live compiled executables
    (observed repeatedly 2026-08-17/18: the suite dies near the ~72nd test
    regardless of which test that is; the same tests pass in isolation, and
    a run that errored out of ~10 heavy compiles early survived). Dropping
    compiled programs between modules keeps the live-executable count
    bounded. Within-module caching (the expensive fixtures) is preserved."""
    yield
    import jax
    jax.clear_caches()


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


def hilbert_path_mask(order: int) -> np.ndarray:
    """Thin 4-connected path tracing the order-n Hilbert curve, drawn at
    2x scale so it is one pixel wide: (2*2^n, 2*2^n) bool with O(4^n) bends
    — the worst case for iterative min-label propagation (each row+col
    sweep pair crosses only ~2 bends)."""
    n = 1 << order
    cells = []
    for d in range(n * n):
        x = y = 0
        t, s = d, 1
        while s < n:
            rx = 1 & (t // 2)
            ry = 1 & (t ^ rx)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            x += s * rx
            y += s * ry
            t //= 4
            s *= 2
        cells.append((y, x))
    mask = np.zeros((2 * n, 2 * n), bool)
    for (y0, x0), (y1, x1) in zip(cells, cells[1:]):
        mask[2 * y0, 2 * x0] = True
        mask[y0 + y1, x0 + x1] = True  # midpoint connector
    mask[2 * cells[-1][0], 2 * cells[-1][1]] = True
    return mask


def pytest_collection_modifyitems(session, config, items):
    """Workaround for a jaxlib CPU-compiler crash on this box: compiling
    the pinned-metrics programs late in a process that has already
    compiled hundreds of executables segfaults inside
    backend_compile_and_load (observed repeatedly 2026-08-17, always at
    test_pinned_metrics once the suite grew past ~133 tests; the same
    tests pass in isolation or early). Stable sort → only these move."""
    items.sort(key=lambda it: 0 if "test_pinned_metrics" in it.nodeid else 1)
