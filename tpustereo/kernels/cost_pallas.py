"""Fused census transform + Hamming cost volume Pallas kernel
(SURVEY.md §3 #3-4, §7 step 4).

One pass: census bitstrings for left and right are built in-register (24
shifted compares each) and the cost slab C[x, d] = popcount(cenL[x] ^
cenR[x-d]) materialises directly as the output block — the census planes
never touch HBM. The x-d re-index uses the same log-shear as the WTA kernel
(lane-masked rolls); popcount is SWAR bit-twiddling with a shift-add fold.

Mosaic discipline (hard-won): the kernel contains NO in-kernel slicing at
unaligned offsets — an earlier design sliced a 12-row VMEM window at row
offsets 0..4 and silently read wrong data on chip (interpret mode was
exact; compiled census undercounted on 90% of pixels). Instead the five
row-shifted views needed by the 5-tall census window are pre-materialised
at the jnp level as (G, R, Wq) arrays whose blocks ARE the needed rows
(block trailing dims equal to array dims), and the column offsets happen
via full-width `pltpu.roll` (margins guarantee no wrap into real lanes).
The output is written full-block in the margin-bearing Wq frame and sliced
by the caller.

Supports census windows up to 64 bits (two bitplanes); the jnp fallback
(`ops.census` + `ops.cost_volume`) covers larger windows. Bit-exact vs the
fallback and `golden.cost_volume_numpy`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 4

# Popcount implementation inside the cost kernel: "native" rides Mosaic's
# `math.ctpop` lowering of lax.population_count (hardware popcount when the
# VPU has one); "swar" is the shift-add fold below (~12 vector ops).
# "native" has been validated bit-exact on-chip across every batch since
# r10 (r13 onward set it explicitly; all CPU-reference exactness gates
# pass with it) and is the measured-faster production default.
POPCOUNT_IMPL = "native"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _popcount32(v: jnp.ndarray) -> jnp.ndarray:
    """Popcount on int32 (values used are <= 32 bits of census)."""
    if POPCOUNT_IMPL == "native":
        return jax.lax.population_count(v)
    # SWAR shift-add fold (no vector multiply: int32 vector multiply is not
    # bit-exact on this Mosaic)
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    v = v + (v >> 8)
    v = v + (v >> 16)
    return v & 0x3F


def _census_from_shifts(rows, rx: int) -> list:
    """rows: list over dy of (R, Wq) int32 row-planes (dy-shifted image);
    returns the census as a list of (R, Wq) int32 bitplanes (margins
    produce junk that callers never read). Column shifts via rolls —
    roll(x, s)[i] = x[i-s], so neighbour col l+dx is roll by -dx."""
    Wq = rows[0].shape[1]
    center = rows[len(rows) // 2]
    planes = []
    out = jnp.zeros(center.shape, jnp.int32)
    bit = 0
    for buf in rows:
        for dx in range(-rx, rx + 1):
            if buf is center and dx == 0:
                continue
            q = pltpu.roll(buf, (-dx) % Wq, axis=1)
            out = out | ((q < center).astype(jnp.int32) << (bit % 32))
            bit += 1
            if bit % 32 == 0:
                planes.append(out)
                out = jnp.zeros(center.shape, jnp.int32)
    if bit % 32:
        planes.append(out)
    return planes


def _shear_down(slab: jnp.ndarray, lane: jnp.ndarray,
                bits: int = 7) -> jnp.ndarray:
    """out[.., x, d] = slab[.., x-d, d] (wrap mod W; callers mask).
    bits: roll-tree depth — 7 covers D <= 128, 8 covers D <= 256
    (multi-vreg lane rolls are the proven idiom, see the align roll)."""
    for b in range(bits):
        rolled = pltpu.roll(slab, 1 << b, axis=1)
        slab = jnp.where(((lane >> b) & 1) == 1, rolled, slab)
    return slab


def _kernel(*refs, n_dy, rx, d_real, max_cost, w_real, h_real, align,
            with_t, g_frame, d_start):
    l_refs = refs[:n_dy]
    r_refs = refs[n_dy:2 * n_dy]
    oob_ref = refs[2 * n_dy]
    out_ref = refs[2 * n_dy + 1]
    t_ref = refs[2 * n_dy + 2] if with_t else None
    cl = _census_from_shifts([r[0] for r in l_refs], rx)   # plane list
    cr = _census_from_shifts([r[0] for r in r_refs], rx)

    R, Wq = cl[0].shape
    D = out_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, Wq, D), 2)
    pc = None
    for clp, crp in zip(cl, cr):
        if d_start:
            # min_disparity: plane j matches cenR[x - d_start - j]; one
            # constant roll before the per-lane shear shifts every plane
            # (wrap deposits junk only where the OOB mask fires anyway)
            crp = pltpu.roll(crp, d_start % Wq, axis=1)
        crs = _shear_down(jnp.broadcast_to(crp[..., None], (R, Wq, D)), lane,
                          bits=(D - 1).bit_length())
        p = _popcount32(clp[..., None] ^ crs)
        pc = p if pc is None else pc + p
    # out-of-search mask (x-d < 0 | d >= D | x >= W): a fixed (col, lane)
    # pattern, precomputed once at the jnp level — rebuilding it per step
    # from two (R, Wq, D) iotas + 3 compares cost ~25% of the kernel
    pc = jnp.where(oob_ref[0] != 0, max_cost, pc)

    def emit(res):
        out_ref[...] = res
        if t_ref is not None:
            # fused transposed emission: the (R, Wq, D) -> (Wq, R, D)
            # sublane shuffle is the same relayout transpose_hw_pallas
            # does, moved here so C never makes the extra HBM round trip.
            # The output array is (Wq, G, R, D) — a free reshape of
            # (Wq, Hp, D) — so the R-sized block dim is a whole array dim
            # and every block starts tile-aligned (R=4 rows would
            # otherwise put odd grid steps at sublane offset 4, which
            # Mosaic reads/writes silently wrong).
            t_ref[...] = jnp.swapaxes(res, 0, 1)[:, None]

    if align:
        # aligned/padded emission: real col x on lane x (one sublane roll,
        # vs a full-volume lane-shift relayout pass after the kernel), and
        # padded rows (>= h_real) uniform ZERO — a lane-uniform cost row
        # keeps the sweeps' q-carry at a fresh path start, so reverse scans
        # entering from the padding are exact (see dist.tiling)
        pc = pltpu.roll(pc, (Wq - rx) % Wq, axis=1)
        # row/step index within the current frame (frames stack on the row
        # axis; g_frame grid steps each)
        tf = jax.lax.rem(pl.program_id(0), g_frame)
        last = (h_real - 1) // R
        @pl.when(tf >= last)  # only blocks holding padded rows pay the mask
        def _zero_pad_rows():
            row = tf * R + jax.lax.broadcasted_iota(jnp.int32, (R, Wq, D), 0)
            emit(jnp.where(row >= h_real, 0, pc).astype(jnp.uint8))
        @pl.when(tf < last)
        def _plain():
            emit(pc.astype(jnp.uint8))
    else:
        out_ref[...] = pc.astype(jnp.uint8)


def census_cost_volume_pallas(left: jnp.ndarray, right: jnp.ndarray,
                              num_disp: int, max_cost: int,
                              window=(5, 5),
                              interpret: bool = False,
                              padded: bool = False,
                              with_transposed: bool = False,
                              d_start: int = 0):
    """(H, W) uint8 ×2 -> (H, W, D) uint8 cost volume, one fused pass.

    Drop-in for `cost_volume(census(l), census(r), ...)` when the census
    fits 64 bits. Plane j searches disparity hypothesis d_start + j
    (min_disparity — golden/sgbm_numpy.py cost_volume_numpy): one extra
    constant roll per census plane plus the shifted OOB mask. D up to 256
    (two 128-lane blocks; the shear gains a roll level and the row count
    shrinks to keep the in-kernel (R, Wq, D) int32 shear temps inside
    scoped VMEM — calibrated against the r21-exact/r2-OOM points).

    padded=True returns the sweep-ready frame instead: (Hp, Wq, Dp) with
    real col x on lane x, H rounded to 8, W+margins rounded to 128, and
    zero cost on the padded rows — `sgm_select_pallas` consumes it with no
    intermediate slice/pad copy of the volume.

    with_transposed=True (requires padded=True) additionally returns the
    horizontal-sweep layout Ct = (Wq, Hp, Dp), identical to
    `transpose_hw_pallas(C, trim=False)` but emitted from this same pass —
    the vertical-layout volume never makes the extra HBM round trip
    through a standalone transpose kernel (VERDICT r1 "next" #3).

    left/right may also be (F, H, W): F frames stacked on the row axis
    (requires padded=True). Returns C (F*Hp, Wq, Dp) / Ct (Wq, F*Hp, Dp)
    with each frame occupying its own Hp-row band — the row-plane inputs
    are built per frame, so census windows never read across frames, and
    each frame's padded rows are zeroed exactly as in the single case.
    """
    ch, cw = window
    assert ch * cw - 1 <= 64, "Pallas census kernel supports <=64 bits"
    ry, rx = ch // 2, cw // 2
    frames = 1 if left.ndim == 2 else left.shape[0]
    assert padded or frames == 1
    H, W = left.shape[-2:]
    Dp = _round_up(num_disp, 128)
    assert Dp <= 512, "cost kernel supports D <= 512"
    Wq = _round_up(W + 2 * rx, 128)
    # rows per grid step: the in-kernel (R, Wq, D) int32 shear/broadcast
    # temps dominate scoped VMEM. Calibration points: R=4 at Wq*Dp=1536*128
    # = 197K lanes-cells ran exact on chip (r21); R=4 at Wq=3072, Dp=128
    # OOM'd (r2 probe); R=8 at Wq=1280, Dp=128 measured 23.99 MB (r37). So
    # cap R*Wq*Dp at the proven 4*1536*128 and halve R until it fits.
    rows = _ROWS
    while rows > 1 and rows * Wq * Dp > 4 * 1536 * 128:
        rows //= 2
    Hp = _round_up(H, 8 if padded else rows)
    G = Hp // rows

    def prep1(img):
        """list over dy in [-ry, ry] of (G, R, Wq) int32 row-plane arrays.
        int32 because Mosaic widens u8 as if signed (pixels >= 128 would
        flip the compares); lane l = image col l - rx (margins edge-pad)."""
        p = jnp.pad(img, ((ry, ry + Hp - H), (rx, rx)), mode="edge")
        p = jnp.pad(p, ((0, 0), (0, Wq - p.shape[1]))).astype(jnp.int32)
        return [p[ry + dy: ry + dy + Hp].reshape(G, rows, Wq)
                for dy in range(-ry, ry + 1)]

    def prep(img):
        if frames == 1:
            return prep1(img if img.ndim == 2 else img[0])
        per = [prep1(img[f]) for f in range(frames)]
        return [jnp.concatenate([per[f][i] for f in range(frames)], axis=0)
                for i in range(len(per[0]))]

    import numpy as _np
    lane = _np.arange(Dp)[None, :]
    col = _np.arange(Wq)[:, None] - rx           # real image column
    # int8, not int32: this constant block is streamed into VMEM with the
    # grid, so its footprint is per-step DMA — 160 KB instead of 640 KB
    oob = ((col - lane - d_start < 0) | (lane >= num_disp)
           | (col >= W)).astype(_np.int8)[None]

    assert padded or not with_transposed
    operands = prep(left) + prep(right) + [jnp.asarray(oob)]
    n_dy = 2 * ry + 1
    spec = pl.BlockSpec((1, rows, Wq), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, n_dy=n_dy, rx=rx, d_real=num_disp,
                               max_cost=max_cost, w_real=W, h_real=H,
                               align=padded, with_t=with_transposed,
                               g_frame=G, d_start=d_start)
    Gt = frames * G
    out_specs = pl.BlockSpec((rows, Wq, Dp), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((frames * Hp, Wq, Dp), jnp.uint8)
    if with_transposed:
        out_specs = (out_specs,
                     pl.BlockSpec((Wq, 1, rows, Dp), lambda t: (0, t, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((Wq, Gt, rows, Dp), jnp.uint8))
    res = pl.pallas_call(
        kernel,
        grid=(Gt,),
        in_specs=[spec] * (2 * n_dy) + [
            pl.BlockSpec((1, Wq, Dp), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if with_transposed:
        C, Ct4 = res
        return C, Ct4.reshape(Wq, frames * Hp, Dp)
    if padded:
        return res
    return res[:H, rx:rx + W, :num_disp]
