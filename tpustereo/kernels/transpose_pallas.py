"""(H, W, D) -> (W, H, D) volume transpose as a Pallas tile kernel.

XLA's transpose of the cost/sum volumes between the vertical and horizontal
sweep layouts runs at ~50 GB/s on the dev chip (2.5 + 3.2 ms per frame);
this kernel moves (8, 128, D) tiles through VMEM with the minor (D) dim
untouched — the swap of the two leading dims is a cheap sublane shuffle —
and sustains full HBM bandwidth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 8     # rows per tile
_TW = 128   # cols per tile


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(in_ref, out_ref):
    out_ref[...] = jnp.swapaxes(in_ref[...], 0, 1)


def _kernel_sum(a_ref, b_ref, out_ref):
    out_ref[...] = jnp.swapaxes(a_ref[...] + b_ref[...], 0, 1)


def transpose_sum_hw_pallas(a: jnp.ndarray, b: jnp.ndarray,
                            interpret: bool = False,
                            trim: bool = True, th: int = _TH) -> jnp.ndarray:
    """(a + b) transposed (H, W, D) -> (W, H, D) in one pass: the add rides
    the transpose's tile traffic (2 reads + 1 write vs 3R+2W for a
    separate XLA add), which is what keeps the bidirectional sweep's two
    emitted volumes HBM-neutral vs the sequential absorb-in-place path
    (kernels.sgm_pallas.sgm_sweep_bidir). int16 adds are a proven Mosaic
    idiom (the sweeps' S accumulation)."""
    H, W, D = a.shape
    assert a.shape == b.shape and a.dtype == b.dtype
    Hp, Wp = _round_up(H, th), _round_up(W, _TW)
    pad = ((0, Hp - H), (0, Wp - W), (0, 0))
    ap, bp = jnp.pad(a, pad), jnp.pad(b, pad)
    spec = pl.BlockSpec((th, _TW, D), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel_sum,
        grid=(Hp // th, Wp // _TW),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((_TW, th, D), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wp, Hp, D), a.dtype),
        interpret=interpret,
    )(ap, bp)
    return out[:W, :H] if trim else out


def transpose_hw_pallas(x: jnp.ndarray, interpret: bool = False,
                        trim: bool = True, th: int = _TH) -> jnp.ndarray:
    """x: (H, W, D) -> (W, H, D); D a multiple of 128. Pads internally for
    arbitrary H, W; trim=False keeps the zero padding (Wp, Hp, D) — the
    sweep kernels want padded operands anyway. th: rows per tile (the
    sublane granularity of the shuffle; exposed for on-chip tuning)."""
    H, W, D = x.shape
    Hp, Wp = _round_up(H, th), _round_up(W, _TW)
    xp = jnp.pad(x, ((0, Hp - H), (0, Wp - W), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(Hp // th, Wp // _TW),
        in_specs=[pl.BlockSpec((th, _TW, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_TW, th, D), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wp, Hp, D), x.dtype),
        interpret=interpret,
    )(xp)
    return out[:W, :H] if trim else out
