"""tpustereo — a TPU-native stereo-matching framework.

Built from scratch in JAX/XLA with Pallas kernels, covering the classic SGBM
pipeline (census matching cost, H×W×D cost volume, semi-global 4/8-path DP
aggregation, WTA + subpixel parabola, LR consistency + speckle filtering),
a SAD block-matching mode, multi-chip/multi-host scaling (batch sharding over
DCN, strip tiling with halo exchange over ICI), and a minimal stereo-odometry
backend (features + pose graph).

Capability surface per /root/repo/SURVEY.md (the reference checkout
hilbertw/stereo_matching is empty — see SURVEY.md §0 — so parity is defined
against the golden NumPy/OpenCV oracle chain in `tpustereo.golden`).
"""

import os as _os

from tpustereo.config import Config, PRESETS  # noqa: F401

__version__ = "0.1.0"


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — compile-once across processes.
    Called lazily by the API/CLI; safe to call before or after jax import
    (it only sets jax.config values).

    No-op on the CPU backend: jaxlib's CPU executable serializer segfaults
    on this box (observed 2026-08-17 — crash inside
    compilation_cache.put_executable_and_time, nondeterministically killing
    the test suite; its AOT loader also warns of machine-feature
    mismatches). The cache matters on the TPU path, where server-side
    compiles cost 5-30 min; CPU compiles are cheap enough to repeat."""
    import jax

    # config-only check: jax.default_backend() would initialise the
    # backend at import time (api.py calls this on import; imports must
    # stay backend-free for the multihost bootstrap paths)
    if str(jax.config.jax_platforms or "").startswith("cpu"):
        return
    path = path or _os.environ.get("TPUSTEREO_CACHE_DIR",
                                   "/tmp/tpustereo_jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
