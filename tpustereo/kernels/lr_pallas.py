"""d_L/d_R consistency check as a Pallas kernel (SURVEY.md §3 #7).

The jnp `ops.postproc.dr_consistency` runs D static full-image shifts at the
XLA level — correct, but each shift materialises an (H, W) concat and the
whole pass costs ~2-3 ms at KITTI size, a visible slice of the frame once
the SGM sweeps are kernelised. Here the same D-iteration select runs on a
64-row VMEM slab, so each iteration is 3 VPU ops on (64, Wq+D)
registers: the shifted d_R lookup is a `pltpu.roll` over a frame whose left
margin is D columns of BIG sentinel — a wrap can only deposit garbage into
that margin (shift < D <= margin), never into real columns, so no per-d
column masking is needed (the BIG sentinel also fails x - d < 0 lookups,
exactly like the jnp version).

Bit-exact vs `ops.postproc.dr_consistency` (same |d - d_R(x-d)| <= max_diff
predicate, same out-of-image semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1 << 20
_ROWS = 64


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(dl_ref, dr_ref, out_ref, *, d_real, max_diff, d_off):
    dl = dl_ref[...]                       # (R, d_off + Wq) int32
    # the D iterations are inherent (a destination-dependent variable lane
    # shift has no log-depth roll form — rolled partials carry the wrong
    # element's shift state), so minimise ops per iteration instead: one
    # incremental roll + one select materialises d_R(x - d_L(x)), and the
    # |d_L - ·| <= max_diff predicate runs ONCE at the end (3 slab ops/iter
    # vs 6 for the per-d three-compare form). Padded dl = -1 matches no d,
    # so padding emits 0 via |−1 − BIG| > max_diff. The loop is a
    # lax.fori_loop, NOT a Python unroll: Mosaic stack-allocates every
    # live unrolled temporary (128 unrolled iterations at 64-row blocks
    # OOM'd scoped VMEM at 34.6 MB — ~96 slabs never reused); the carried
    # loop keeps exactly two slabs live.
    cur0 = dr_ref[...]
    res0 = jnp.where(dl == 0, cur0, jnp.full(dl.shape, _BIG, jnp.int32))

    def body(d, carry):
        cur, res = carry
        cur = pltpu.roll(cur, 1, axis=1)             # [x] = dr[x - d]
        return cur, jnp.where(dl == d, cur, res)

    _, res = jax.lax.fori_loop(1, d_real, body, (cur0, res0))
    out_ref[...] = (jnp.abs(dl - res) <= max_diff).astype(jnp.int32)


def _kernel_hits(dl_ref, dr_ref, out_ref, hits_ref, *, d_real, max_diff,
                 d_off):
    """`_kernel` plus the epipolar-intersection map for occlusion/mismatch
    classification (ops.postproc.lr_hits): hits[x] ⇔ ∃ d with
    |d_R(x-d) - d| <= max_diff. Rides the same incremental roll — the hit
    test per d is 3 extra slab ops. The BIG margin makes out-of-image
    lookups miss; roll wrap deposits only into the margin (d < d_off)."""
    dl = dl_ref[...]
    cur0 = dr_ref[...]
    res0 = jnp.where(dl == 0, cur0, jnp.full(dl.shape, _BIG, jnp.int32))
    hit0 = (jnp.abs(cur0) <= max_diff).astype(jnp.int32)

    def body(d, carry):
        cur, res, hit = carry
        cur = pltpu.roll(cur, 1, axis=1)
        return (cur, jnp.where(dl == d, cur, res),
                hit | (jnp.abs(cur - d) <= max_diff).astype(jnp.int32))

    _, res, hit = jax.lax.fori_loop(1, d_real, body, (cur0, res0, hit0))
    out_ref[...] = (jnp.abs(dl - res) <= max_diff).astype(jnp.int32)
    hits_ref[...] = hit


def dr_consistency_pallas(d_r: jnp.ndarray, disp: jnp.ndarray, num_disp: int,
                          max_diff: int, interpret: bool = False,
                          with_hits: bool = False, d_start: int = 0):
    """|d_L(x) - d_R(x - round(d_L(x)))| <= max_diff; (H, W) bool.

    d_r int32, disp float32, both (H, W). Drop-in for the jnp
    `dr_consistency`. with_hits=True additionally returns the
    `ops.postproc.lr_hits` intersection map (for fill_mode='hirschmuller')
    from the same pass.

    d_start (min_disparity): the kernel is disparity-INDEX based and
    unchanged — `disp` arrives in true units (dl index = round - d_start),
    `d_r` in the fused path's shifted-column index convention
    (d_r[x] = j_R(right col x - d_start), see sweep_bwd_wta), under which
    the lookup for pixel x is d_r[x - j_L] — the same roll the d_start=0
    kernel runs. The only d_start-specific bit is the in-image condition:
    x - d_L >= 0 ⟺ lookup col >= d_start, so the first d_start REAL
    columns of d_r join the BIG sentinel margin (they hold right cols
    < 0). Matches `ops.postproc.dr_consistency`/`lr_hits` exactly."""
    H, W = d_r.shape
    Hp = _round_up(H, _ROWS)
    d_off = _round_up(num_disp, 128)
    Wq = _round_up(W, 128)
    Wp = d_off + Wq

    dl = jnp.round(disp).astype(jnp.int32) - d_start
    d_r = d_r.astype(jnp.int32)
    if d_start:
        col = jnp.arange(W, dtype=jnp.int32)[None, :]
        d_r = jnp.where(col < d_start, _BIG, d_r)
    # left margin: BIG sentinels (out-of-image lookups + roll wrap target);
    # dl margin/padding = -1 matches no d, so padded columns emit 0
    dlp = jnp.pad(dl, ((0, Hp - H), (d_off, Wq - W)), constant_values=-1)
    drp = jnp.pad(d_r, ((0, Hp - H), (d_off, Wq - W)),
                  constant_values=_BIG)

    spec = pl.BlockSpec((_ROWS, Wp), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((Hp, Wp), jnp.int32)
    if with_hits:
        kernel = functools.partial(_kernel_hits, d_real=min(num_disp, W),
                                   max_diff=max_diff, d_off=d_off)
        ok, hits = pl.pallas_call(
            kernel,
            grid=(Hp // _ROWS,),
            in_specs=[spec, spec],
            out_specs=(spec, spec),
            out_shape=(shape, shape),
            interpret=interpret,
        )(dlp, drp)
        return (ok[:H, d_off:d_off + W].astype(bool),
                hits[:H, d_off:d_off + W].astype(bool))
    kernel = functools.partial(_kernel, d_real=min(num_disp, W),
                               max_diff=max_diff, d_off=d_off)
    ok = pl.pallas_call(
        kernel,
        grid=(Hp // _ROWS,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=shape,
        interpret=interpret,
    )(dlp, drp)
    return ok[:H, d_off:d_off + W].astype(bool)
