"""3×3 median filter Pallas kernel (SURVEY.md §3 #9).

Same structure as the cost kernel's census: the three row-shifted views are
pre-materialised as (G, R, Wq) arrays (no in-kernel unaligned slicing —
Mosaic reads wrong data silently), column shifts are full-width rolls, and
the median-of-9 is Paeth's 19-exchange min/max network, all on f32 slabs.
Bit-exact vs `ops.median3` (identical network) and `golden.median3_numpy`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8

_NET = [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
        (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
        (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(up_ref, mid_ref, dn_ref, out_ref):
    Wq = out_ref.shape[1]
    t = []
    for r in (up_ref, mid_ref, dn_ref):
        row = r[0]
        t.append(pltpu.roll(row, 1, axis=1))        # left neighbour
        t.append(row)
        t.append(pltpu.roll(row, Wq - 1, axis=1))   # right neighbour
    for i, j in _NET:
        t[i], t[j] = jnp.minimum(t[i], t[j]), jnp.maximum(t[i], t[j])
    out_ref[...] = t[4]


def median3_pallas(disp: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(H, W) float32 -> (H, W) float32, 3×3 median with edge replication.

    Also accepts (F, H, W) stacked frames: the row-shifted views are built
    per frame (edge replication stays per-frame exact) and concatenated on
    the grid axis, so F frames cost one kernel launch instead of F."""
    frames = 1 if disp.ndim == 2 else disp.shape[0]
    H, W = disp.shape[-2:]
    Hp = _round_up(H, _ROWS)
    Wq = _round_up(W + 2, 128)
    G = Hp // _ROWS

    def prep1(d):
        # lane l = image col l-1 (one edge-replicated margin col each side,
        # so the in-kernel ±1 rolls never wrap into real lanes)
        p = jnp.pad(d, ((1, 1 + Hp - H), (1, 1)), mode="edge")
        p = jnp.pad(p, ((0, 0), (0, Wq - p.shape[1])))
        return [p[dy:dy + Hp].reshape(G, _ROWS, Wq) for dy in range(3)]

    if frames == 1:
        rows = prep1(disp if disp.ndim == 2 else disp[0])
    else:
        per = [prep1(disp[f]) for f in range(frames)]
        rows = [jnp.concatenate([per[f][i] for f in range(frames)], axis=0)
                for i in range(3)]

    spec = pl.BlockSpec((1, _ROWS, Wq), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(frames * G,),
        in_specs=[spec] * 3,
        out_specs=pl.BlockSpec((_ROWS, Wq), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((frames * Hp, Wq), jnp.float32),
        interpret=interpret,
    )(*rows)
    if disp.ndim == 2:
        return out[:H, 1:1 + W]
    return out.reshape(frames, Hp, Wq)[:, :H, 1:1 + W]
