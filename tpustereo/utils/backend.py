"""Backend dispatch shared by pipeline and ops (SURVEY.md §3)."""

from __future__ import annotations

import os
import warnings

import jax

from tpustereo.config import Config


def _on_tpu() -> bool:
    try:
        return "TPU" in jax.devices()[0].device_kind
    except RuntimeError:  # pragma: no cover
        return False


def pallas_mode(cfg: Config) -> str:
    """'compiled' | 'interpret' | 'off'.

    'auto' uses the Mosaic-compiled Pallas kernels on TPU and pure jnp
    elsewhere; 'pallas' forces the kernels (interpret mode off-TPU, for
    tests); 'jnp' forces the fallback.
    """
    if cfg.backend == "jnp":
        return "off"
    on_tpu = _on_tpu()
    if cfg.backend == "pallas":
        return "compiled" if on_tpu else "interpret"
    return "compiled" if on_tpu else "off"


class TPUFallbackError(RuntimeError):
    """A TPU run would land on the jnp compute fallback, which XLA is
    KNOWN to miscompile on TPU (see `guard_tpu_fallback`)."""


class TPUFallbackWarning(UserWarning):
    pass


_UNSAFE_ENV = "TPUSTEREO_UNSAFE_TPU_FALLBACK"


def guard_tpu_fallback(cfg: Config, stage: str) -> None:
    """Refuse to run the jnp cost/aggregate/select fallback on a TPU.

    The r19 on-chip diagnosis (CLAUDE.md; scripts/tpu_diag_midhalf*)
    proved XLA MISCOMPILES the pure-jnp SGM pipeline on the dev TPU at
    750x1500 (rows >= 376 silently wrong) while every Pallas stage matched
    CPU truth — so jnp compute paths reached on TPU return unverified (and
    in the proven envelope, wrong) results. Until a config's Pallas gate
    is lifted, dispatching it on TPU must be loud, not graceful
    (VERDICT r3 weak #1).

    Call sites are the jnp branches of the pipeline's cost / aggregate /
    WTA dispatch (pipeline/sgbm.py, dist/tiling.py). The verified-on-chip
    jnp paths (SAD volume at config-1 geometry, the postproc chain) are
    not guarded. Set TPUSTEREO_UNSAFE_TPU_FALLBACK=1 to downgrade the
    error to a warning (e.g. to reproduce the miscompile itself).
    Runs at trace time — zero cost in the compiled program.
    """
    if not _on_tpu():
        return
    msg = (
        f"TPU dispatch fell back to the pure-jnp {stage} path, which XLA "
        f"is known to miscompile on TPU (r19: silently wrong rows at "
        f"750x1500). Offending config: mode={cfg.mode!r}, "
        f"D={cfg.num_disparities}, min_disparity={cfg.min_disparity}, "
        f"census={cfg.census_window}, paths={cfg.paths}, "
        f"p1/p2={cfg.p1}/{cfg.p2}, sad_block={cfg.sad_block}, "
        f"backend={cfg.backend!r}. Use a Pallas-gated operating point "
        f"(D <= 512, paths*(census_bits+p2) < 4096), or set "
        f"{_UNSAFE_ENV}=1 to accept unverified results."
    )
    if os.environ.get(_UNSAFE_ENV) == "1":
        warnings.warn(msg, TPUFallbackWarning, stacklevel=3)
        return
    raise TPUFallbackError(msg)
