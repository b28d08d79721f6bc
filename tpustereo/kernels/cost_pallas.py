"""Fused census transform + Hamming cost volume Pallas kernel
(SURVEY.md §3 #3-4, §7 step 4).

One pass: for each 8-row output block the kernel receives a 12-row image
window (the 2-row census halo is pre-materialised as overlapping windows at
the jnp level — a ~1.5 MB copy — because Mosaic cannot DMA-slice VMEM
memrefs at sublane-unaligned dynamic offsets), builds the 24-bit census
bitstrings for left and right in-register (24 shifted compares each), and
materialises the cost slab C[x, d] = popcount(cenL[x] ^ cenR[x-d]) directly
as the (8, W, D) output block — the (H, W) census planes never touch HBM.
The x-d re-index uses the same log-shear as the WTA kernel (7 lane-masked
rolls); popcount is SWAR bit-twiddling. The disparity slab work runs in two
4-row sub-chunks to keep int32 temporaries inside the 16 MB VMEM budget.

Supports census windows up to 32 bits (the standard 5×5 = 24); the jnp
fallback (`ops.census` + `ops.cost_volume`) covers larger windows.
Bit-exact vs the fallback and `golden.cost_volume_numpy`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8       # output rows per grid step
_SUB = 4        # rows per in-kernel disparity sub-chunk


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _popcount32(v: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount on int32 (values used are <= 32 bits of census)."""
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return (v * 0x01010101) >> 24


def _census_rows(buf: jnp.ndarray, ry: int, rx: int, R: int, W: int):
    """(R+2ry, >=W+2rx) int32 rows -> (R, W) int32 census bitstrings.

    Bit k (row-major over the window, centre excluded) set iff
    neighbour < centre — the golden convention (sgbm_numpy.census_numpy).
    """
    center = buf[ry:ry + R, rx:rx + W]
    out = jnp.zeros((R, W), jnp.int32)
    bit = 0
    for dy in range(-ry, ry + 1):
        for dx in range(-rx, rx + 1):
            if dy == 0 and dx == 0:
                continue
            q = buf[ry + dy:ry + dy + R, rx + dx:rx + dx + W]
            out = out | ((q < center).astype(jnp.int32) << bit)
            bit += 1
    return out


def _shear_down(slab: jnp.ndarray, lane: jnp.ndarray) -> jnp.ndarray:
    """out[.., x, d] = slab[.., x-d, d] (wrap mod W; callers mask)."""
    for b in range(7):
        rolled = pltpu.roll(slab, 1 << b, axis=1)
        slab = jnp.where(((lane >> b) & 1) == 1, rolled, slab)
    return slab


def _kernel(l_ref, r_ref, out_ref, *, window, d_real, max_cost, Wp):
    ry, rx = window[0] // 2, window[1] // 2
    lbuf = l_ref[0].astype(jnp.int32)            # (R+2ry, Wq)
    rbuf = r_ref[0].astype(jnp.int32)
    cl = _census_rows(lbuf, ry, rx, _ROWS, Wp)   # (R, Wp) int32
    cr = _census_rows(rbuf, ry, rx, _ROWS, Wp)

    D = out_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, Wp, D), 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (_SUB, Wp, D), 1)
    for j in range(_ROWS // _SUB):
        clj = cl[j * _SUB:(j + 1) * _SUB]
        crj = cr[j * _SUB:(j + 1) * _SUB]
        crs = _shear_down(jnp.broadcast_to(crj[..., None], (_SUB, Wp, D)),
                          lane)
        pc = _popcount32(clj[..., None] ^ crs)
        pc = jnp.where((col - lane < 0) | (lane >= d_real), max_cost, pc)
        out_ref[j * _SUB:(j + 1) * _SUB] = pc.astype(jnp.uint8)


def census_cost_volume_pallas(left: jnp.ndarray, right: jnp.ndarray,
                              num_disp: int, max_cost: int,
                              window=(5, 5),
                              interpret: bool = False) -> jnp.ndarray:
    """(H, W) uint8 ×2 -> (H, W, D) uint8 cost volume, one fused pass.

    Drop-in for `cost_volume(census(l), census(r), ...)` when the census
    fits 32 bits.
    """
    ch, cw = window
    assert ch * cw - 1 <= 32, "Pallas census kernel supports <=32 bits"
    ry, rx = ch // 2, cw // 2
    H, W = left.shape
    Dp = _round_up(num_disp, 128)
    Wp = _round_up(W, 32)
    Hp = _round_up(H, _ROWS)
    Wq = _round_up(Wp + 2 * rx, 128)
    G = Hp // _ROWS
    win_rows = _ROWS + 2 * ry

    def prep(img):
        # edge-replicate the window margins; zero-fill the tile padding;
        # then materialise the G overlapping (win_rows, Wq) windows
        p = jnp.pad(img, ((ry, ry + Hp - H), (rx, rx)), mode="edge")
        p = jnp.pad(p, ((0, 0), (0, Wq - p.shape[1])))
        return jnp.stack([p[t * _ROWS:t * _ROWS + win_rows] for t in range(G)])

    lw, rw = prep(left), prep(right)
    kernel = functools.partial(_kernel, window=window, d_real=num_disp,
                               max_cost=max_cost, Wp=Wp)
    C = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, win_rows, Wq), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, win_rows, Wq), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ROWS, Wp, Dp), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, Dp), jnp.uint8),
        interpret=interpret,
    )(lw, rw)
    return C[:H, :W, :num_disp]
