"""Backend dispatch shared by pipeline and ops (SURVEY.md §3)."""

from __future__ import annotations

import jax

from tpustereo.config import Config


def pallas_mode(cfg: Config) -> str:
    """'compiled' | 'interpret' | 'off'.

    'auto' uses the Mosaic-compiled Pallas kernels on TPU and pure jnp
    elsewhere; 'pallas' forces the kernels (interpret mode off-TPU, for
    tests); 'jnp' forces the fallback.
    """
    if cfg.backend == "jnp":
        return "off"
    try:
        on_tpu = "TPU" in jax.devices()[0].device_kind
    except RuntimeError:  # pragma: no cover
        on_tpu = False
    if cfg.backend == "pallas":
        return "compiled" if on_tpu else "interpret"
    return "compiled" if on_tpu else "off"
