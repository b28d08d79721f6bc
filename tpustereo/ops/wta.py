"""WTA disparity selection + uniqueness + subpixel parabola fit, pure jnp.

Mirrors `golden.wta_numpy` exactly (same tie-breaking, same uniqueness and
clamping conventions — SURVEY.md §1.1). The Pallas version fuses this with
the last aggregation sweep; this is the fallback/parity target.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpustereo.config import Config

_BIG = jnp.int32(1 << 24)


def wta(S: jnp.ndarray, cfg: Config):
    """S: (H, W, D) int -> (disp float32, d_int int32, valid bool)."""
    H, W, D = S.shape
    Si = S.astype(jnp.int32)
    d_int = jnp.argmin(Si, axis=-1).astype(jnp.int32)
    best = jnp.min(Si, axis=-1)
    valid = jnp.ones((H, W), bool)

    if cfg.uniqueness_ratio > 0:
        dd = jnp.arange(D)[None, None, :]
        masked = jnp.where(jnp.abs(dd - d_int[..., None]) <= 1, _BIG, Si)
        second = masked.min(axis=-1)
        valid &= ~(second * 100 < best * (100 + cfg.uniqueness_ratio))

    disp = d_int.astype(jnp.float32)
    if cfg.subpixel:
        dm = jnp.clip(d_int - 1, 0, D - 1)
        dp = jnp.clip(d_int + 1, 0, D - 1)
        sm = jnp.take_along_axis(Si, dm[..., None], -1)[..., 0].astype(jnp.float32)
        sp = jnp.take_along_axis(Si, dp[..., None], -1)[..., 0].astype(jnp.float32)
        s0 = best.astype(jnp.float32)
        denom = sm - 2.0 * s0 + sp
        offs = jnp.where(denom > 0, (sm - sp) / jnp.maximum(2.0 * denom, 1e-9), 0.0)
        offs = jnp.clip(offs, -0.5, 0.5)
        interior = (d_int > 0) & (d_int < D - 1)
        disp = disp + jnp.where(interior, offs, 0.0)
    return disp, d_int, valid
