"""SGM path aggregation as Pallas TPU scan kernels — the hot loop
(SURVEY.md §3 #5, §7 step 4).

Why a kernel: the recurrence is sequential along the scan axis, and XLA's
`lax.scan` pays a fixed per-step cost (dispatch + carry HBM round-trip +
output dynamic-update) that dominates at KITTI scale (~48 ms for the 8
directions, measured). Here one Pallas grid step consumes one scanline slab
from a double-buffered VMEM pipeline while the (K, N, D) carry lives in VMEM
scratch across grid steps, so the whole directional sweep is a single fused
on-core loop.

Layout (SURVEY.md §7 hard parts): D (disparity) rides the 128-lane minor
dimension; the perpendicular image axis N fills sublanes; the scan axis T is
the grid — (R, N, D) blocks with an in-kernel serial walk (ref[j]
major-axis reads, which Mosaic handles exactly; single-sublane squeezed
blocks over the middle axis are illegal, and unaligned sublane slicing is
silently wrong — see the r1 census bug). R defaults to 1: the sweeps
measured VPU-compute-bound on-chip (6.40/6.64/6.88 ms at R=1/4/8 for the
KITTI 3-direction sweep), so fattening has no per-step overhead to
amortise and only coarsens the DMA pipeline.
A sweep processes every direction with the same scan-axis sign at once
(e.g. S, SE, SW going down): diagonals differ only by an in-carry sublane
shift dx, so they share the C slab load and the S accumulation. The four
sweeps (down, up over rows of C; forward, backward over rows of C^T)
accumulate S in place via input/output aliasing — the full 8-path
aggregation reads C twice + C^T twice and writes/reads S once per sweep.

Bit-exact vs `ops.sgm.aggregate` / `golden.aggregate_numpy`: the uniform-BIG
carry initialisation renormalises to L = C at path starts, identical to the
jnp fallback's explicit masking (see `_ring_path` for the same trick).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpustereo.config import Config

_BIG = 1 << 24
_BIGPACK = 1 << 20   # 'infinite' in packed (value*256 + lane) int32 contexts

# Fused transposed-S emission from the vertical sweeps (rank-4 block
# trick). Measured on chip (r20 A/B at KITTI F=4 b16): 18.625 ms/frame
# fused vs 18.435 ms with the external tile-transpose — the masked-RMW
# emission plus the two-S forward sweep costs slightly MORE than the
# standalone St transpose it replaces, so the default is OFF. Kept
# (exact, tested, VMEM-gated) for re-measurement if the transpose ever
# grows (e.g. other D) — flip via this module toggle + jax.clear_caches().
EMIT_TRANSPOSED = False

# Direction-batched vertical sweeps: process the K fused directions as ONE
# (K, N, D) slab per scan row — the renorm roll-tree, the up/dn lane
# shifts, and the bracket mins run once on a K-fold-taller slab instead of
# K times on (N, D), cutting per-row op issues ~2.5x for the K=3 8-path
# sweeps. Measured on chip (r22, KITTI F=4 b16): 15.392 ms batched vs
# 15.381 per-direction — a wash; the sweeps are genuinely compute-bound,
# not issue-bound. Default OFF (per-direction has K-fold smaller live
# temps, so less scoped-VMEM risk); kept exact + tested for re-measurement.
BATCH_DIRS = False

# SWAR 2x16-in-32 sweeps: pack the slab's row HALVES two-per-lane
# ((i, i+N/2) pairing) so every op runs on half the vregs; mins become
# ~13-bit-op exact SWAR mins (no packed-SIMD min exists in Mosaic — int16
# vector min fails to legalize, r29), rolls along lanes move both fields
# together (the 32-bit roll rule holds), and diagonal sublane rolls need
# one seam fixup + per-field OOB masks. Measured on the production-I/O
# micro (int8 in, int16 out, identical HBM bytes): 0.933x the int32 step
# (9.71 vs 10.41 us/step, r29c) — a ~7% compute win on the sweep inner
# loop. Gated to non-adaptive, non-ring, non-emit sweeps with N % 16 == 0;
# field safety: values bounded by c_max + p2 < 4096 << 2^15 (the pipeline
# dispatch gate) and the P2 clip keeps every intermediate under
# _BIG16 + p2. Toggle + jax.clear_caches() for on-chip A/B.
SWEEP_SWAR = True
_BIG16 = 0x4000

# Native-bfloat16 sweeps (round-4 candidate, width_micro 'bf16_i8'): every
# value in the renormalized recurrence is an integer <= c_max + p2 (the
# renorm subtract + P2 clip bound it), which bf16 represents EXACTLY when
# c_max + p2 <= 255 (true at every gated preset: 144 KITTI, 182 at 9x7
# census) — so the step can ride native bf16 SIMD: 2 values per 32-bit
# lane with 1-op mins instead of the ~12-bit-op exact SWAR min, and
# Mosaic owns the packed layout (no halves pairing, no seam fixups).
# Candidate sums above 255 (real q + p1 past the clip) round, but any
# such value exceeds the P2 clip, so the min is unaffected (rounding of
# an integer > 256 stays >= 256 > p2). Per-direction L converts to int32
# for the S accumulation (sums of K paths exceed 256). Takes precedence
# over SWEEP_SWAR where its gate holds; needs the caller to pass the true
# cost bound c_max (default 255 keeps it off). Toggle +
# jax.clear_caches() for on-chip A/B.
# ADOPTED r43d/r43e: sweeps-only bf16 measures kitti8 79.89 vs 76.61 fps
# (+4.3%) and sgm4 90.36 vs 89.19 (+1.3%) against the same-day defaults;
# exact on chip (small + kitti f0). BWD_BF16 measured a ~1 fps LOSS at
# kitti8 (75.7 bwd-only) and stays off.
SWEEP_BF16 = True
# The bwd+WTA kernel's embedded recurrence adopts bf16 INDEPENDENTLY of
# the sweeps: the r43b full-pipeline A/B moved differently per kernel
# family (headline +3% with everything bf16, sgm4 -8%), so the combo
# space is toggled separately and measured.
BWD_BF16 = False
# Columns per grid step of the bwd+WTA kernel (power of two <= 128; the
# masked-RMW output blocks are 128 wide, so a step must stay inside one).
# The r47 A/B at sweeps-R=1 read a wash (+0.07 fps); re-measured at the
# r57 SWEEP_ROWS=4 baseline it is a small consistent win — r59 headline:
# R=1 80.79, R=8 81.03, R=32 81.02 fps. R=8 adopted (bit-identical to
# R=1 on chip at KITTI geometry, r47/r60; the per-step (R, N, D) x 2
# volume blocks amortise double-buffer boundaries).
# Flip + jax.clear_caches().
BWD_ROWS = 8

# Scanlines per grid step of the directional sweeps. The r20 R-study
# (R=1 fastest) ran on the pre-bf16 step; bf16 halves per-row compute
# and the tradeoff INVERTED — r56/r57 headline A/B: R=1 79.82, R=2
# 80.50, R=4 80.86 fps, exact on chip. R=4 adopted (it is also the
# VMEM/divisibility cap at KITTI geometry). Flip + jax.clear_caches().
SWEEP_ROWS = 4
# Scanlines per grid step for sweeps carrying LANE-MAJOR adaptive maps
# (kept separate from SWEEP_ROWS: the r53 lane-major layout shipped with
# R pinned to 1, but any R dividing 128 keeps a step's rows inside one
# 128-row map block — the same invariant the bwd kernel's RMW output
# blocks already rely on at BWD_ROWS=8 — so the r56 R-inversion win is
# available here too, VMEM permitting: the K double-buffered lane-major
# blocks shrink r_max vs the non-adaptive sweeps). MEASURED r61 on chip
# (adaptive kitti8 F=4): R=1 70.46, R=2 70.17, R=4 69.17 fps — the
# inversion does NOT transfer (the per-row one-hot map extraction is
# per-row work fattening cannot amortise, and the map blocks' VMEM
# share clamps the S-carrying sweeps' r_max); R=1 stays the default,
# exact on chip at the shipped defaults (r61: adaptive single + F=4
# stacked vs CPU refs, 0 mismatches). R in {2, 4} kept for
# re-measurement — interpret-tested AND chip-gated exact at R=4
# (r63: same refs, 0 mismatches). Flip + jax.clear_caches().
ADAPTIVE_SWEEP_ROWS = 1

# Adaptive-P2 map layout in the sweep kernels: split the (T, N, K) stack
# into K separate (T, N, 1) operands so the per-row per-direction read is
# a straight (N, 1) block load instead of a lane slice at offset k.
# MEASURED r51: a clear LOSS — standalone vertical sweep 5.61 ms split vs
# 3.29 stacked (3.11 no-p2 control; the in-kernel lane slice costs only
# ~0.18 ms/sweep, while 3 separate 128-lane-padded (R, N, 1) block
# streams triple the map DMA), full adaptive pipeline 56.35 vs 56.70
# fps. Default OFF (stacked); kept exact + tested for re-measurement.
SPLIT_P2 = False

# Lane-major adaptive-P2 maps: a (T, N, small-K) Pallas operand is forced
# into the (8, 128)-tiled layout, padding K up to 128 LANES — the fused
# adaptive pipeline writes AND streams ~42x the real map bytes (the r52
# attribution's unexplained ~3.4 ms composition residual). Lane-major
# packs each direction's (T, N) map as (ceil(T/128), N, 128) with the
# SCAN ROW on the lane axis — dense, zero padding — fetched once per 128
# rows (revisited block) and extracted per row by an exact one-hot MXU
# dot ((N, 128) @ (128, 1) at Precision.HIGHEST; values < 2^24). The
# (T, N, K) stack never reaches a pallas_call, so XLA keeps it in a
# compact internal layout (or fuses it away entirely). R must be 1
# (rows never straddle a 128-block). Toggle + jax.clear_caches().
P2_LANE_MAJOR = True


def _p2_lane_major(p2_maps: jnp.ndarray):
    """(T, N, K) int32 -> list of K dense (ceil(T/128), N, 128) arrays
    (scan row t lives at block t//128, lane t%128)."""
    T, N, K = p2_maps.shape
    Tb = (T + 127) // 128
    out = []
    for k in range(K):
        m = jnp.pad(p2_maps[:, :, k], ((0, Tb * 128 - T), (0, 0)))
        out.append(jnp.swapaxes(m.reshape(Tb, 128, N), 1, 2))
    return out
# Padded-lane / fresh-path sentinel: a power of two is exact in bf16, and
# 16384's coarse rounding (spacing 128) keeps renormalized padded carries
# >= ~16k — far above any real candidate — forever. (A small sentinel
# like 256 would leak: q_pad = L_pad - min_d L can come within c_max+p2
# of real values after one renorm.)
_BF_BIG = 16384.0


def _swar_min(a, b):
    """Per-16-bit-field min of packed int32 lanes; all fields in
    [0, 0x7FFF). t's field sign bit = a_f >= b_f because 0x8000 + a_f -
    b_f cannot borrow across fields (kernels/width_micro.py, proven exact
    on chip r29/r29c)."""
    t = (a | (-0x7FFF8000)) - b          # 0x80008000 as int32
    m_hi = t & (-0x80000000)
    e_hi = m_hi >> 15                    # arithmetic: 0xFFFF0000 or 0
    m_lo = t & 0x8000
    e_lo = (m_lo - (m_lo >> 15)) | m_lo  # 0xFFFF or 0
    e = e_hi | e_lo
    return (b & e) | (a & ~e)


def _swar_tree_min(L):
    """Packed per-field all-lanes min, replicated (the SWAR analog of
    _min_lanes_full; lane rolls move both fields together)."""
    M = L
    for b in range(_lane_bits(L.shape[-1])):
        M = _swar_min(M, _roll(M, 1 << b, axis=1))
    return M


def _swar_sgm_step(q, cp, laneH, D, p1, p2_const):
    """One packed dx=0 SGM recurrence step shared by _sweep_kernel and
    _bwd_wta_kernel (ONE copy of the bit-trick family: a Mosaic workaround
    applied here reaches both kernels — the r30f lesson). q, cp: (M, D)
    halves-packed; returns (q_next, L) packed. p2_const: a scalar int
    (packed to both fields here), or an already-FIELD-PACKED (M, 1)/(M, D)
    int32 array — per-row adaptive P2' via the lane-major maps (each
    field's clip applies to its own row; _swar_min broadcasts)."""
    big2 = (_BIG16 << 16) | _BIG16
    up = _roll(q, -1, axis=1)
    up = jnp.where(laneH == D - 1, big2, up)
    dn = _roll(q, 1, axis=1)
    dn = jnp.where(laneH == 0, big2, dn)
    if isinstance(p2_const, jnp.ndarray):
        p2pk = jnp.broadcast_to(p2_const, q.shape)
    else:
        p2pk = jnp.full(q.shape, (p2_const << 16) | p2_const, jnp.int32)
    cand = _swar_min(_swar_min(q, _swar_min(up, dn) + ((p1 << 16) | p1)),
                     p2pk)
    L = cp + cand
    return L - _swar_tree_min(L), L


def _dir_step_swar(q, cpk, dx, rowH, laneH, n_real, D, p1, p2_const):
    """One direction's halves-packed sweep step including the diagonal
    seam fixup + per-field fresh-start masks (shared by _sweep_kernel and
    the bidirectional kernel — one copy of the bit-trick family, r30f).
    q: (Hh, D) packed carry as read; returns (q_next, L) packed."""
    Hh = q.shape[0]
    if dx != 0:
        q = _roll(q, dx, axis=0)
        # NO negative-constant AND masks anywhere below: Mosaic
        # miscompiled `q & ~0xFFFF` at production sublane counts
        # (r30f bisect: diag+n_real wrong from sublane 608 on, exact in
        # interpret and at small N) — hi-field writes are expressed with
        # shifts/subtracts instead.
        if dx > 0:
            # wrapped sublane 0: lo wants row Hh-1 = its hi
            # (hi is OOB there and zeroed below)
            t16 = q >> 16
        else:
            # wrapped sublane Hh-1: hi wants row Hh = its lo
            t16 = q & 0xFFFF
        fix = (t16 << 16) | t16
        q = jnp.where(rowH == (0 if dx > 0 else Hh - 1), fix, q)
        # per-field fresh-start masks (the v32 branch's `invalid` test,
        # evaluated at each field's true row)
        hi_inv = (rowH < dx) | (rowH >= n_real + dx)
        lo_inv = ((rowH + Hh) < dx) | ((rowH + Hh) >= n_real + dx)
        q = jnp.where(hi_inv, q & 0xFFFF, q)
        q = jnp.where(lo_inv, q - (q & 0xFFFF), q)
    return _swar_sgm_step(q, cpk, laneH, D, p1, p2_const)


def _dir_step_v32(q, c, dx, row_idx, lane_idx, n_real, D, p1, p2):
    """One direction's unpacked (int32) sweep step (shared by
    _sweep_kernel and the bidirectional kernel). Returns (q_next, L)."""
    if dx != 0:
        q = _roll(q, dx, axis=0)
        # rows whose predecessor (n - dx) falls outside [0, n_real)
        # start a fresh path: uniform-zero q gives L = C below. For
        # dx == 0 padded rows never interact with real rows.
        invalid = (row_idx < dx) | (row_idx >= n_real + dx)
        q = jnp.where(invalid, 0, q)
    up = _roll(q, -1, axis=1)
    up = jnp.where(lane_idx == D - 1, _BIG, up)
    dn = _roll(q, 1, axis=1)
    dn = jnp.where(lane_idx == 0, _BIG, dn)
    cand = jnp.minimum(jnp.minimum(q, jnp.minimum(up, dn) + p1), p2)
    L = c + cand
    return L - _min_lanes_full(L), L


def _bf16_roll_lanes(x, shift):
    """Lane roll of a bf16 slab via its int32 bit view. Mosaic does not
    legalize 16-bit rolls (r43 on-chip probe — bf16 rolls fail on BOTH
    axes, like int16 in r1); bf16 packs pairs of SUBLANES into 32-bit
    words, so a 32-bit LANE roll moves both packed values exactly like a
    bf16 lane roll would."""
    xi = pltpu.bitcast(x, jnp.int32)
    return pltpu.bitcast(_roll(xi, shift, axis=xi.ndim - 1), jnp.bfloat16)


def _bf16_shift_rows(x, dx):
    """Circular one-ROW (sublane) shift of a bf16 slab, dx in {+1, -1}.
    The int32 bit view holds bf16 rows (2i -> lo 16 bits, 2i+1 -> hi) of
    word row i (pltpu.bitcast packing order), so a one-row shift is a
    one-WORD sublane roll + an hi/lo field swap. Field extraction uses
    shifts and positive-constant masks only: every field is a
    non-negative bf16 pattern (sign bit 0, so >> 16 is exact), and
    negative-constant ANDs are forbidden (r30 Mosaic miscompile)."""
    xi = pltpu.bitcast(x, jnp.int32)
    if dx == 1:     # new row j = old row j-1
        prev = _roll(xi, 1, axis=0)
        out = (prev >> 16) | ((xi & 0xFFFF) << 16)
    else:           # new row j = old row j+1
        nxt = _roll(xi, -1, axis=0)
        out = (xi >> 16) | ((nxt & 0xFFFF) << 16)
    return pltpu.bitcast(out, jnp.bfloat16)


def _bf16_tree_min(L):
    """All-lanes min of a bf16 slab, replicated: bf16 mins with the rolls
    routed through the int32 bit view. An alternative that runs the whole
    tree on the bit view with SWAR field mins (positive IEEE patterns are
    monotone, 2 bitcasts total instead of 14) measured SLOWER end to end
    (r43c: kitti8 75.0 vs 78.9 fps, sgm4 88.9 vs 90.5) — in the tree
    context Mosaic schedules the per-level bitcasts far cheaper than the
    dependent bitcast-roll chain micro suggested, while SWAR-min's 12
    int32 ops are real work; so the 1-op bf16 min wins."""
    for b in range(_lane_bits(L.shape[-1])):
        L = jnp.minimum(L, _bf16_roll_lanes(L, 1 << b))
    return L


def _dir_step_bf16(q, c, dx, row_idx, lane_idx, n_real, D, p1, p2):
    """One direction's native-bfloat16 sweep step (see SWEEP_BF16):
    structurally `_dir_step_v32` in bf16 — 1-op packed mins, no halves
    pairing or seam fixups; rolls detour through the int32 bit view with
    the per-step bitcast count kept minimal (5 axial / 7 diagonal —
    bitcasts are the dominant overhead, r43b). Exact while
    c_max + p2 <= 255 (integers <= 255 are exact in bf16 and rounding
    past the P2 clip cannot change a min). Returns (q_next, L) both
    bf16. row_idx/lane_idx are iotas of q's (full-row) shape."""
    if dx != 0:
        q = _bf16_shift_rows(q, dx)
        invalid = (row_idx < dx) | (row_idx >= n_real + dx)
        q = jnp.where(invalid, jnp.bfloat16(0), q)
    qi = pltpu.bitcast(q, jnp.int32)  # shared by both neighbour rolls
    up = pltpu.bitcast(_roll(qi, D - 1, axis=1), jnp.bfloat16)
    up = jnp.where(lane_idx == D - 1, jnp.bfloat16(_BF_BIG), up)
    dn = pltpu.bitcast(_roll(qi, 1, axis=1), jnp.bfloat16)
    dn = jnp.where(lane_idx == 0, jnp.bfloat16(_BF_BIG), dn)
    p2b = p2 if isinstance(p2, jnp.ndarray) else jnp.bfloat16(p2)
    cand = jnp.minimum(jnp.minimum(q, jnp.minimum(up, dn)
                                   + jnp.bfloat16(p1)), p2b)
    L = c + cand
    return L - _bf16_tree_min(L), L


# Bidirectional vertical sweeps: one kernel advances the down sweep at row
# t and the up sweep at row T-1-t per grid step (independent recurrence
# chains interleave; half the grid steps), emitting separate S_down/S_up
# volumes that a SUMMING tile transpose combines — volume HBM passes stay
# at the sequential path's count and one C read disappears. Toggle for
# the on-chip A/B (VERDICT r3 next #2); default set by measurement.
BIDIR_VERT = False

# MXU-assisted WTA refinement: the uniqueness and subpixel stages are
# one-hot extractions / violation counts over the lane axis — lane SUMS,
# not mins — so they can ride an (N, D) @ (D, 1) matmul with a ones
# vector on the MXU (exact: one-hot picks a single value < 2^20, f32
# holds ints < 2^24; counts <= 128) instead of a 14-op roll-tree each on
# the VPU. That removes two of the four per-column trees from the
# bwd+WTA kernel AND moves the work to the otherwise-idle MXU. Toggle for
# on-chip A/B.
MXU_REFINE = True


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fit_rows(T: int, want: int) -> int:
    """Largest divisor of T that is <= want (fattened rows per grid step)."""
    r = max(1, min(want, T))
    while T % r:
        r -= 1
    return r


def _roll(x, shift: int, axis: int):
    """Circular shift; pltpu.roll only takes non-negative shifts."""
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def emit_transposed_feasible(T: int, N: int, D: int, K: int,
                             frames: int = 1) -> bool:
    """True when a transposed-emission sweep fits VMEM at R=4 — the
    rank-4 output block needs >= 4 rows per grid step (R=1 would make the
    block single-sublane, which Mosaic handles wrongly), and wide volumes
    (true-Middlebury W) can push the double-buffered slabs past budget.
    Emission sweeps carry no S_in operand (r17 on-chip lesson: C + S_in +
    a separate transposed out + the stacked emission temps hit 24.2 MB
    scoped VMEM at KITTI geometry — 8 MB over; the two vertical sweeps
    emit separate transposed volumes instead and the forward horizontal
    sweep adds both). Mirrors sgm_sweep's budget arithmetic."""
    per_row = N * D * (1 + 2)
    fixed = 4 * K * N * D
    r_max = max(1, (12 * 1024 * 1024 - fixed) // max(1, 2 * per_row))
    return r_max >= 4 and (T // frames) % 4 == 0


def bwd_wta_feasible(n_sublanes: int, D: int) -> bool:
    """True when the fused bwd+WTA kernel fits scoped VMEM at R=1 for a
    (T, n_sublanes, D) volume. Calibrated from Mosaic's own accounting,
    not the naive block arithmetic (which badly underestimates the
    kernel-stack share): the F=8 frame stack (n_sublanes=3008, D=128)
    measured 23.87 MB scoped — ~62 bytes per (sublane, lane) element —
    while F=4 (1504) compiles and runs. Keep ~1.3 MB of headroom."""
    return 62 * n_sublanes * D <= 14 * 1024 * 1024


def _lane_bits(D: int) -> int:
    """Roll-tree depth for a minor-axis width D (a multiple of 128, up to
    512 = four lanes of vregs — multi-vreg lane rolls are the proven
    idiom; the cost kernel's align roll covers Wq ~ 1280). ceil(log2 D)
    levels: after level k every lane holds the min of a circular window
    of 2^k lanes, and a window >= D covers all lanes (the wrap overlap is
    harmless for idempotent min), so non-power-of-two widths (384) work
    too (VERDICT r3 next #1)."""
    assert D % 128 == 0 and 128 <= D <= 512, D
    return (D - 1).bit_length()


def _pack_shift(D: int) -> int:
    """Bits reserved for the lane index in (value << ps) + lane packings.
    8 for D <= 256 (the long-gated production packing, *256), widening to
    9/10 for D = 384/512 — value headroom holds: S < 2^20 (the _BIGPACK
    clamp) so packed < 2^30 < int32."""
    return max(8, (D - 1).bit_length())


def _min_lanes_full(x: jnp.ndarray) -> jnp.ndarray:
    """All-lanes min, replicated to every lane, via a log roll-tree over the
    minor axis (128 or 256 wide). Mosaic's native lane reduce + broadcast
    measured 5.9 us per call on a (1248, 128) slab vs ~1.4 us for this —
    and the reduces are the dominant per-step cost of the SGM sweeps."""
    for b in range(_lane_bits(x.shape[-1])):
        x = jnp.minimum(x, pltpu.roll(x, 1 << b, axis=x.ndim - 1))
    return x


def _sweep_kernel(c_ref, *rest, dxs, p1, p2_const, n_real, d_real, R, reverse,
                  n_s, n_p2, p2_lm, has_init, has_fin, g_frame,
                  emit_t=False, batch_k=False, swar=False, bf16=False):
    """One grid step = R scanlines, walked serially in-register (reversed
    for reverse sweeps). rest = (*s_refs, [p2_ref], [init_ref], out_ref,
    [fin_ref], carry_ref) depending on flags; n_s S volumes (0-2) are
    accumulated into the output per row.

    emit_t: the output block is the TRANSPOSED (N, 1, R, D) slice of a
    rank-4 (N, G, R, D) array — a free reshape of the horizontal-sweep
    layout (N, T, D) — so the vertical sweeps hand the S volume to the
    horizontal sweeps without the standalone transpose kernel's HBM round
    trip (same rank-4 whole-array-dim trick as the cost kernel's fused-Ct
    emission). Emission is a sublane-masked read-modify-write of the
    output block per scan row — the bwd kernel's revisited-block idiom —
    NOT a jnp.stack of the R row slabs: keeping R live row outputs plus
    the stacked/reshaped temps measured ~8 MB of Mosaic stack over budget
    at KITTI geometry (r17 on-chip OOM)."""
    idx = 0
    s_refs = rest[:n_s]
    idx += n_s
    # adaptive-P2 operands: one stacked (R, N, K) ref, or K split
    # (R, N, 1) refs (SPLIT_P2 — no per-row lane slicing in-kernel)
    p2_refs = rest[idx:idx + n_p2]
    idx += n_p2
    init_ref = rest[idx] if has_init else None
    idx += 1 if has_init else 0
    out_ref = rest[idx]
    idx += 1
    fin_ref = rest[idx] if has_fin else None
    idx += 1 if has_fin else 0
    carry_ref = rest[idx]

    t = pl.program_id(0)
    # slab dims from the COST block: the swar carry is (K, N//2, D)
    N, D = c_ref.shape[1], c_ref.shape[2]

    # carries hold the renormalised q = L - min_d L (the bracket of the
    # recurrence becomes min(q, q±1+P1, P2), so the P2 clip is a scalar and
    # a fresh path start is a uniform-ZERO carry -> L = C). The recurrence
    # depends on the predecessor row ONLY through q, so q is also the exact
    # state to hand off between strip chips in ring-tiled mode (init_ref /
    # fin_ref; dist/tiling._ring_sweep_pallas).
    # Frame-stacked volumes (g_frame < num_programs) re-zero the carry at
    # every frame seam: in execution order, row G-1-t (reverse) or t
    # (forward) enters a new frame exactly when t % g_frame == 0, so one
    # condition covers both sweep directions and the reset is an exact
    # per-frame fresh path start.
    @pl.when(jax.lax.rem(t, g_frame) == 0)
    def _():
        if init_ref is not None:
            # ring hand-off slabs are int32 on the wire (ppermute between
            # strips); the bf16 carry converts at the boundary — exact:
            # real q <= c_max+p2 <= 255 and padded-lane sentinels are
            # bf16-representable by construction
            carry_ref[...] = init_ref[...].astype(carry_ref.dtype)
        else:
            carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (N, D), 0)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (N, D), 1)
    K = len(dxs)

    if p2_lm:
        # lane-major maps (P2_LANE_MAJOR): scan row r lives at lane
        # r % 128 of the (N, 128) block; extract the (N, 1) column with
        # an exact one-hot MXU dot (values < 2^24, Precision.HIGHEST)
        base = ((pl.num_programs(0) - 1 - t) if reverse else t) * R
        lane128c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

        def p2_onehot(j):
            # one one-hot per scan row, shared by all K directions
            return (lane128c == jax.lax.rem(base + j, 128)).astype(
                jnp.float32)

        def p2_read(k, oh):
            return jnp.dot(p2_refs[k][0].astype(jnp.float32), oh,
                           precision=jax.lax.Precision.HIGHEST
                           ).astype(jnp.int32)

    if emit_t:
        sub = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 2)
    order = range(R - 1, -1, -1) if reverse else range(R)
    for j in order:
        c = c_ref[j].astype(jnp.int32)
        if not swar and not bf16 and d_real < D:
            # padded lanes act as +inf hypotheses
            c = jnp.where(lane_idx >= d_real, _BIG, c)

        if bf16:
            # native-bf16 step (see SWEEP_BF16): costs <= c_max <= 255 are
            # bf16-exact; S accumulates per direction in int32 (sums of K
            # paths exceed bf16's exact-integer range)
            cb = c.astype(jnp.bfloat16)
            if d_real < D:
                cb = jnp.where(lane_idx >= d_real, jnp.bfloat16(_BF_BIG),
                               cb)
            total = None
            oh_j = p2_onehot(j) if p2_lm else None
            for k, dx in enumerate(dxs):
                if p2_lm:
                    p2k = p2_read(k, oh_j).astype(jnp.bfloat16)   # (N, 1)
                elif len(p2_refs) > 1:    # split layout: straight block read
                    p2k = p2_refs[k][j].astype(jnp.bfloat16)      # (N, 1)
                elif p2_refs:
                    # adaptive P2: per-pixel values <= p2 stay bf16-exact
                    # under the same c_max + p2 <= 255 gate
                    p2k = p2_refs[0][j][:, k:k + 1].astype(jnp.bfloat16)
                else:
                    p2k = p2_const
                qn, L = _dir_step_bf16(carry_ref[k], cb, dx, row_idx,
                                       lane_idx, n_real, D, p1, p2k)
                carry_ref[k] = qn
                Li = L.astype(jnp.int32)
                total = Li if total is None else total + Li
            out = total.astype(jnp.int16)
            for s_ref in s_refs:
                out = out + s_ref[j]
            out_ref[j] = out
            continue

        if swar:
            # 2x16 halves-packed step (see SWEEP_SWAR): rows (i, i+N/2)
            # share a lane; every min is a SWAR min; diagonal sublane
            # rolls get a one-sublane seam fixup + per-field OOB masks
            Hh = N // 2
            laneH = jax.lax.broadcasted_iota(jnp.int32, (Hh, D), 1)
            rowH = jax.lax.broadcasted_iota(jnp.int32, (Hh, D), 0)
            big2 = (_BIG16 << 16) | _BIG16
            cpk = (c[:Hh] << 16) | c[Hh:]
            if d_real < D:
                cpk = jnp.where(laneH >= d_real, big2, cpk)
            total = None
            for k, dx in enumerate(dxs):
                qn, L = _dir_step_swar(carry_ref[k], cpk, dx, rowH, laneH,
                                       n_real, D, p1, p2_const)
                carry_ref[k] = qn
                total = L if total is None else total + L
            # fields stay < 2^15 (P2-clipped, paths*(c_max+p2) gated by
            # the pipeline), so the halves unpack exactly
            out = jnp.concatenate([(total >> 16).astype(jnp.int16),
                                   (total & 0xFFFF).astype(jnp.int16)],
                                  axis=0)
            for s_ref in s_refs:
                out = out + s_ref[j]
            out_ref[j] = out
            continue

        if batch_k:
            # all K directions as one (K, N, D) slab per row: one renorm
            # tree on (K*N, D), one up/dn shift pair, one bracket — ~2.5x
            # fewer op issues for K=3 at identical vector work. The dx
            # shifts differ per direction: roll the whole slab both ways
            # and select per-k; the predecessor-out-of-range mask applies
            # uniformly ((row < dx_k) | (row >= n_real + dx_k) — for
            # dx == 0 it merely zeroes padded rows, whose outputs are
            # sliced off and whose carries other rows never read unmasked).
            Q = carry_ref[...]
            laneK = jax.lax.broadcasted_iota(jnp.int32, (K, N, D), 2)
            if any(dx != 0 for dx in dxs):
                # per-k masks from iotas (pallas_call rejects captured
                # constant arrays as implicit inputs)
                kidx = jax.lax.broadcasted_iota(jnp.int32, (K, N, D), 0)
                rowK = jax.lax.broadcasted_iota(jnp.int32, (K, N, D), 1)

                def kmask(ks):
                    m = kidx == ks[0]
                    for k in ks[1:]:
                        m = m | (kidx == k)
                    return m

                pos_ks = [k for k, dx in enumerate(dxs) if dx == 1]
                neg_ks = [k for k, dx in enumerate(dxs) if dx == -1]
                dxa = jnp.zeros((), jnp.int32)
                if pos_ks:
                    posm = kmask(pos_ks)
                    Q = jnp.where(posm, _roll(Q, 1, axis=1), Q)
                    dxa = dxa + posm.astype(jnp.int32)
                if neg_ks:
                    negm = kmask(neg_ks)
                    Q = jnp.where(negm, _roll(Q, -1, axis=1), Q)
                    dxa = dxa - negm.astype(jnp.int32)
                Q = jnp.where((rowK < dxa) | (rowK >= n_real + dxa), 0, Q)
            up = _roll(Q, -1, axis=2)
            up = jnp.where(laneK == D - 1, _BIG, up)
            dn = _roll(Q, 1, axis=2)
            dn = jnp.where(laneK == 0, _BIG, dn)
            cand = jnp.minimum(jnp.minimum(Q, jnp.minimum(up, dn) + p1),
                               p2_const)
            L = c[None] + cand
            M = _min_lanes_full(L.reshape(K * N, D)).reshape(K, N, D)
            carry_ref[...] = L - M
            total = jnp.sum(L, axis=0)
        else:
            total = None
            oh_j = p2_onehot(j) if p2_lm else None
            for k, dx in enumerate(dxs):
                if p2_lm:
                    p2 = p2_read(k, oh_j)                         # (N, 1)
                elif len(p2_refs) > 1:
                    p2 = p2_refs[k][j]                            # (N, 1)
                elif p2_refs:
                    p2 = p2_refs[0][j][:, k:k + 1]
                else:
                    p2 = p2_const
                qn, L = _dir_step_v32(carry_ref[k], c, dx, row_idx,
                                      lane_idx, n_real, D, p1, p2)
                carry_ref[k] = qn
                total = L if total is None else total + L

        out = total.astype(jnp.int16)
        for s_ref in s_refs:
            out = out + s_ref[j]
        if emit_t:
            # scatter row j into sublane j of the (N, 1, R, D) block;
            # every sublane is written exactly once per grid step, so the
            # pre-write block contents never reach the output
            b = jnp.broadcast_to(out[:, None, None, :], out_ref.shape)
            out_ref[...] = jnp.where(sub == j, b, out_ref[...])
        else:
            out_ref[j] = out

    if fin_ref is not None:
        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            fin_ref[...] = carry_ref[...].astype(jnp.int32)


def sgm_sweep(C: jnp.ndarray, S_in: jnp.ndarray | None, dxs, reverse: bool,
              p1: int, p2: int, n_real: int, d_real: int,
              p2_maps: jnp.ndarray | None = None,
              init_carry: jnp.ndarray | None = None,
              return_final_carry: bool = False,
              rows_per_step: int = 0,
              frames: int = 1,
              emit_transposed: bool = False,
              interpret: bool = False,
              c_max: int = 255):
    """One directional sweep over axis 0 of C (T, N, D) -> S (T, N, D) int16.

    dxs: in-carry sublane shift per fused direction (0 axial, ±1 diagonal).
    reverse: scan rows T-1..0 (up/backward paths). S_in — one array or a
    tuple of up to two, all in the sweep's own layout — is accumulated
    into the output (the first is aliased in-place); the two-operand form
    lets the forward horizontal sweep absorb both emitted transposed
    volumes without an extra XLA add pass over S-sized HBM. p2_maps:
    (T, N, K) int32 for adaptive P2, else the scalar `p2` applies.

    init_carry / return_final_carry: (K, N, D) int32 q-form carry slabs for
    the exact ring strip hand-off (SURVEY.md §4.3b) — the recurrence sees
    its predecessor row only through q = L - min_d L, so seeding with a
    neighbour strip's final q continues the path bit-exactly.

    rows_per_step: upper bound on scanlines per grid step (0 = 1, the
    measured-fastest setting — the sweeps are VPU-bound, so fattening
    has no fixed cost to amortise); any explicit R is clamped to a divisor of T AND to what the
    ~16 MB VMEM budget admits — double-buffered C/S_in/out slabs scale with
    R*N, so wide volumes (true Middlebury W~3000, or tall transposed
    layouts) must take smaller steps than KITTI-size ones.

    emit_transposed: return S in the horizontal-sweep layout (N, T, D)
    instead of (T, N, D) — the rank-4 output trick (see _sweep_kernel);
    used by the vertical sweeps so the standalone S transpose disappears
    from the pipeline. Incompatible with the ring hand-off AND with S_in
    (VMEM: see emit_transposed_feasible).

    c_max: upper bound on C's values — the exactness precondition for the
    native-bf16 step (SWEEP_BF16 gates on c_max + p2 <= 255); pipeline
    callers pass cfg.max_census_cost, the conservative default keeps
    bf16 off.
    """
    T, N, D = C.shape
    K = len(dxs)
    s_list = list(S_in) if isinstance(S_in, (tuple, list)) else (
        [] if S_in is None else [S_in])
    assert len(s_list) <= 2
    assert D % 128 == 0 and N % 8 == 0, (N, D)
    if emit_transposed:
        assert init_carry is None and not return_final_carry and not s_list
        assert emit_transposed_feasible(T, N, D, K, frames), (T, N, D)
        if rows_per_step <= 0:
            rows_per_step = 4   # cost-kernel _ROWS: proven rank-4 geometry
    if rows_per_step <= 0:
        # The r20 R-study (R=1 fastest: 6.40 vs 6.64 at R=4) ran on the
        # pre-bf16 step; with bf16 halving per-row compute the tradeoff
        # INVERTED — r56 headline: R=1 79.82, R=2 80.50, R=4 80.86 fps
        # (exact on chip), and R=4 is also the VMEM/divisibility cap at
        # KITTI geometry. SWEEP_ROWS carries the adopted default; sweeps
        # with adaptive maps keep R=1 (the lane-major layout — worth far
        # more there, r53 +25% — requires steps that never straddle a
        # 128-row block).
        # D > 128 keeps R=1: the VMEM budget caps those sweeps at R=2,
        # which measured a LOSS there (r57 d256 F=2: 37.5 vs 38.6 fps at
        # R=1) while R=4 wins at D=128 — the inversion only pays when the
        # full fattening fits
        if p2_maps is not None and P2_LANE_MAJOR:
            rows_per_step = ADAPTIVE_SWEEP_ROWS or 1
        else:
            rows_per_step = 1 if D > 128 else (SWEEP_ROWS or 1)
    # VMEM budget: 2x-buffered per-row slabs + the (K, N, D) carry scratch
    # (+ optional init slab) must stay under ~12 MB of the ~16 MB VMEM.
    per_row = N * D * (C.dtype.itemsize + 2 * len(s_list) + 2)
    if p2_maps is not None:
        if P2_LANE_MAJOR:
            pass  # K dense (N, 128) blocks, counted in `fixed` below
        else:
            # minor-dim K (or 1, split) lane-pads to 128 in VMEM
            per_row += 4 * N * 128 * (K if (SPLIT_P2 and K > 1) else 1)
    fixed = 4 * K * N * D * (2 if init_carry is not None else 1)
    if p2_maps is not None and P2_LANE_MAJOR:
        fixed += 2 * 4 * N * 128 * K  # double-buffered lane-major blocks
    budget = 12 * 1024 * 1024 - fixed
    r_max = max(1, budget // max(1, 2 * per_row))
    assert frames == 1 or (init_carry is None and not return_final_carry), \
        "ring carry hand-off is per-strip, not per-frame"
    assert T % frames == 0
    R = _fit_rows(T // frames, min(rows_per_step, r_max))
    if p2_maps is not None and P2_LANE_MAJOR:
        # lane-major map blocks hold 128 scan rows; a step's R rows must
        # never straddle one, so R must divide 128 (the bwd kernel's
        # output-RMW invariant, applied to the map reads)
        while 128 % R:
            R = _fit_rows(T // frames, R - 1)
    G = T // R

    def imap(g):
        return (G - 1 - g, 0, 0) if reverse else (g, 0, 0)

    def whole(g):
        return (0, 0, 0)

    in_specs = [pl.BlockSpec((R, N, D), imap, memory_space=pltpu.VMEM)]
    operands = [C]
    aliases = {}
    for s in s_list:
        in_specs.append(pl.BlockSpec((R, N, D), imap, memory_space=pltpu.VMEM))
        operands.append(s)
    if s_list:
        aliases = {1: 0}
    n_p2 = 0
    p2_lm = False
    if p2_maps is not None:
        if P2_LANE_MAJOR:
            # dense lane-major blocks: row r at block r//128, lane r%128;
            # a step's R rows share one block (128 % R == 0, enforced
            # above), so the block of the step's first row covers them all
            def lm_blk(g):
                r = ((G - 1 - g) if reverse else g) * R
                return (r // 128, 0, 0)

            for m in _p2_lane_major(p2_maps):
                in_specs.append(pl.BlockSpec((1, N, 128), lm_blk,
                                             memory_space=pltpu.VMEM))
                operands.append(m)
            n_p2 = K
            p2_lm = True
        elif SPLIT_P2 and K > 1:
            # one (T, N, 1) operand per direction (XLA slices outside) —
            # the kernel reads straight (N, 1) blocks, no lane slicing
            for k in range(K):
                in_specs.append(pl.BlockSpec((R, N, 1), imap,
                                             memory_space=pltpu.VMEM))
                operands.append(p2_maps[:, :, k:k + 1])
            n_p2 = K
        else:
            in_specs.append(pl.BlockSpec((R, N, K), imap,
                                         memory_space=pltpu.VMEM))
            operands.append(p2_maps)
            n_p2 = 1
    if init_carry is not None:
        in_specs.append(pl.BlockSpec((K, N, D), whole, memory_space=pltpu.VMEM))
        operands.append(init_carry.astype(jnp.int32))

    # SWAR gate (see SWEEP_SWAR): no adaptive-P2 maps, no ring carry
    # hand-off, no transposed emission, no direction batching, halves
    # sublane-aligned (N/2 % 8), and field headroom for P2-clipped values.
    # p1 is in the bound too: min(up, dn) in _swar_sgm_step can hold a
    # padded-lane carry field of ~_BIG16 + p2, and adding p1 must not push
    # it past 0x8000 (_swar_min's field precondition) — unreachable through
    # the pipeline gates, but sgm_sweep is callable directly (r3 advisor).
    # bf16 gate (see SWEEP_BF16): exactness needs the true cost bound
    # c_max (callers pass cfg.max_census_cost; the 255 default keeps bf16
    # off for unknown-provenance volumes). Same structural exclusions as
    # SWAR; takes precedence over it.
    # D (lane) bound: at D=512 the bf16 step's live bitcast views (int32
    # AND bf16 slabs coexist around every roll) measured 17.3M scoped
    # VMEM — 1.3M over the 16M limit (r44 on-chip compile OOM); D <= 256
    # is compile- and exactness-gated (r44), wider lanes take the SWAR
    # branch (exactness-gated at D=512, r42).
    bf16 = (SWEEP_BF16
            and not emit_transposed
            and not (BATCH_DIRS and K > 1)
            and N % 16 == 0 and c_max + p2 <= 255
            and C.shape[-1] <= 256)
    swar = (not bf16 and SWEEP_SWAR and p2_maps is None
            and init_carry is None
            and not return_final_carry and not emit_transposed
            and not (BATCH_DIRS and K > 1)
            and N % 16 == 0 and p1 + p2 + 256 < _BIG16)
    kernel = functools.partial(
        _sweep_kernel, dxs=tuple(dxs), p1=p1, p2_const=p2, n_real=n_real,
        d_real=d_real, R=R, reverse=reverse,
        n_s=len(s_list), n_p2=n_p2, p2_lm=p2_lm,
        has_init=init_carry is not None, has_fin=return_final_carry,
        g_frame=G // frames, emit_t=emit_transposed,
        batch_k=BATCH_DIRS and K > 1 and p2_maps is None, swar=swar,
        bf16=bf16)

    if emit_transposed:
        # rank-4 (N, G, R, D): R a whole array dim -> every block
        # tile-aligned; reshapes for free to the (N, T, D) layout
        def omap(g):
            return (0, G - 1 - g, 0, 0) if reverse else (0, g, 0, 0)
        out_specs = pl.BlockSpec((N, 1, R, D), omap, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((N, G, R, D), jnp.int16)
        aliases = {}
    else:
        out_specs = pl.BlockSpec((R, N, D), imap, memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T, N, D), jnp.int16)
    if return_final_carry:
        out_specs = (out_specs,
                     pl.BlockSpec((K, N, D), whole, memory_space=pltpu.VMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((K, N, D), jnp.int32))

    res = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((K, N // 2 if swar else N, D),
                                   jnp.bfloat16 if bf16 else jnp.int32)],
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
    if emit_transposed:
        return res.reshape(N, T, D)
    return res


# ---------------------------------------------------------------------------
# bidirectional vertical sweep (down + up interleaved per grid step)
# ---------------------------------------------------------------------------

def _bidir_kernel(cd_ref, cu_ref, outd_ref, outu_ref, carry_ref, *,
                  dxs, p1, p2_const, n_real, d_real, g_frame, swar):
    """Grid step t advances the DOWN sweep at row t and the UP sweep at row
    G-1-t in the same step: the two directions' serial recurrence chains
    are fully independent, so Mosaic can interleave their ops (attacking
    the dependency-stall residual the roofline names), and the grid runs
    HALF as many steps for the same row-visits (halving per-step DMA/sync
    granularity). carry_ref holds down carries in [0, K) and up carries in
    [K, 2K). Same math as two `_sweep_kernel` launches — the per-direction
    step is the SAME shared helper (`_dir_step_swar`/`_dir_step_v32`), so
    the Mosaic bit-trick workarounds exist in one copy (r30f lesson)."""
    t = pl.program_id(0)
    N, D = cd_ref.shape[1], cd_ref.shape[2]
    K = len(dxs)

    @pl.when(jax.lax.rem(t, g_frame) == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, jnp.int32)

    cd = cd_ref[0].astype(jnp.int32)
    cu = cu_ref[0].astype(jnp.int32)
    if swar:
        Hh = N // 2
        laneH = jax.lax.broadcasted_iota(jnp.int32, (Hh, D), 1)
        rowH = jax.lax.broadcasted_iota(jnp.int32, (Hh, D), 0)
        big2 = (_BIG16 << 16) | _BIG16
        cpk_d = (cd[:Hh] << 16) | cd[Hh:]
        cpk_u = (cu[:Hh] << 16) | cu[Hh:]
        if d_real < D:
            cpk_d = jnp.where(laneH >= d_real, big2, cpk_d)
            cpk_u = jnp.where(laneH >= d_real, big2, cpk_u)
        tot_d = tot_u = None
        for k, dx in enumerate(dxs):
            qn, L = _dir_step_swar(carry_ref[k], cpk_d, dx, rowH, laneH,
                                   n_real, D, p1, p2_const)
            carry_ref[k] = qn
            tot_d = L if tot_d is None else tot_d + L
            qn, L = _dir_step_swar(carry_ref[K + k], cpk_u, dx, rowH, laneH,
                                   n_real, D, p1, p2_const)
            carry_ref[K + k] = qn
            tot_u = L if tot_u is None else tot_u + L
        outd_ref[0] = jnp.concatenate([(tot_d >> 16).astype(jnp.int16),
                                       (tot_d & 0xFFFF).astype(jnp.int16)],
                                      axis=0)
        outu_ref[0] = jnp.concatenate([(tot_u >> 16).astype(jnp.int16),
                                       (tot_u & 0xFFFF).astype(jnp.int16)],
                                      axis=0)
    else:
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (N, D), 0)
        lane_idx = jax.lax.broadcasted_iota(jnp.int32, (N, D), 1)
        if d_real < D:
            cd = jnp.where(lane_idx >= d_real, _BIG, cd)
            cu = jnp.where(lane_idx >= d_real, _BIG, cu)
        tot_d = tot_u = None
        for k, dx in enumerate(dxs):
            qn, L = _dir_step_v32(carry_ref[k], cd, dx, row_idx, lane_idx,
                                  n_real, D, p1, p2_const)
            carry_ref[k] = qn
            tot_d = L if tot_d is None else tot_d + L
            qn, L = _dir_step_v32(carry_ref[K + k], cu, dx, row_idx,
                                  lane_idx, n_real, D, p1, p2_const)
            carry_ref[K + k] = qn
            tot_u = L if tot_u is None else tot_u + L
        outd_ref[0] = tot_d.astype(jnp.int16)
        outu_ref[0] = tot_u.astype(jnp.int16)


def bidir_feasible(N: int, D: int, K: int, swar: bool) -> bool:
    """VMEM gate for the bidirectional sweep at R=1: 2K carry slabs plus
    double-buffered C (u8) and out (i16) blocks at TWO grid positions."""
    fixed = 4 * 2 * K * (N // 2 if swar else N) * D
    per_step = 2 * 2 * (N * D + 2 * N * D)
    return fixed + per_step <= 12 * 1024 * 1024


def sgm_sweep_bidir(C: jnp.ndarray, dxs, p1: int, p2: int, n_real: int,
                    d_real: int, frames: int = 1, interpret: bool = False):
    """Down and up vertical sweeps over C (T, N, D) in ONE kernel:
    returns (S_down, S_up), each (T, N, D) int16, bit-identical to
    `sgm_sweep(C, None, dxs, False)` / `sgm_sweep(C, None, dxs, True)`.
    Callers combine them with the summing transpose
    (`transpose_sum_hw_pallas`) or a two-operand forward sweep, keeping
    volume HBM traffic at the sequential path's level while the per-step
    dependency chains double (VERDICT r3 next #2)."""
    T, N, D = C.shape
    K = len(dxs)
    assert D % 128 == 0 and N % 8 == 0, (N, D)
    assert T % frames == 0
    G = T
    swar = (SWEEP_SWAR and N % 16 == 0 and p1 + p2 + 256 < _BIG16)
    assert bidir_feasible(N, D, K, swar), (N, D, K)
    kernel = functools.partial(
        _bidir_kernel, dxs=tuple(dxs), p1=p1, p2_const=p2, n_real=n_real,
        d_real=d_real, g_frame=G // frames, swar=swar)

    def fwd(g):
        return (g, 0, 0)

    def rev(g):
        return (G - 1 - g, 0, 0)

    spec = functools.partial(pl.BlockSpec, (1, N, D),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec(fwd), spec(rev)],
        out_specs=(spec(fwd), spec(rev)),
        out_shape=(jax.ShapeDtypeStruct((T, N, D), jnp.int16),
                   jax.ShapeDtypeStruct((T, N, D), jnp.int16)),
        scratch_shapes=[pltpu.VMEM((2 * K, N // 2 if swar else N, D),
                                   jnp.int32)],
        interpret=interpret,
    )(C, C)


# ---------------------------------------------------------------------------
# final backward sweep fused with WTA + incremental right-disparity
# ---------------------------------------------------------------------------

def _wta_from_S(S, amin, lane, D, d_real, cfg, mxu):
    """WTA + uniqueness + subpixel + incremental right-WTA step on one
    slab of COMPLETED S columns (M, D). Factored out of the kernel body so
    the SWAR path can run it once per row half (the WTA value packing
    (S << ps) + lane needs 19+ bits, so WTA itself cannot ride 2x16
    fields). Returns (o1 (M, 1), deltas (M, 1), amin_next (M, D))."""
    M = S.shape[0]
    ps = _pack_shift(D)
    if d_real < D:
        S = jnp.where(lane >= d_real, _BIGPACK, S)
    else:
        # padded-lane L can reach ~2^24; clamp so packing cannot wrap
        S = jnp.minimum(S, _BIGPACK)

    packed = (S << ps) + lane
    m = _min_lanes_full(packed)[:, :1]              # (M, 1)
    best = m >> ps
    d_int = m & ((1 << ps) - 1)
    if mxu:
        ones = jnp.ones((D, 1), jnp.float32)
        one_hot = lane == d_int

    valid = jnp.full((M, 1), True)  # padded sublane rows are sliced off
    if cfg.uniqueness_ratio > 0 and mxu:
        # "no lane outside the d*±1 window violates the ratio" — an
        # existence test == a lane-count, so it rides the MXU (0/1
        # values, count <= 128: exact at any matmul precision) instead
        # of a masked min tree on the VPU
        viol = ((jnp.abs(lane - d_int) > 1)
                & (S * 100 < best * (100 + cfg.uniqueness_ratio)))
        cnt = jnp.dot(jnp.where(viol, 1.0, 0.0), ones)
        valid &= cnt == 0.0
    elif cfg.uniqueness_ratio > 0:
        masked = jnp.where(jnp.abs(lane - d_int) <= 1, _BIGPACK << ps, S)
        second = _min_lanes_full(masked)[:, :1]
        valid &= ~(second * 100 < best * (100 + cfg.uniqueness_ratio))

    if cfg.subpixel and mxu:
        # one-hot extraction of S[d*-1]/S[d*+1] as a lane SUM on the
        # MXU (single nonzero < 2^20 -> exact in f32, but ONLY at
        # Precision.HIGHEST: default bf16 passes have a 8-bit
        # mantissa). Decode matches the tree path bit-for-bit:
        # min(A, best+4095) - best == min(A - best, 4095).
        A = _roll(S, 1, axis=1)    # lane d: S[d-1]
        B = _roll(S, -1, axis=1)   # lane d: S[d+1]
        hi = jax.lax.Precision.HIGHEST
        a_sel = jnp.dot(jnp.where(one_hot, A, 0).astype(jnp.float32),
                        ones, precision=hi).astype(jnp.int32)
        b_sel = jnp.dot(jnp.where(one_hot, B, 0).astype(jnp.float32),
                        ones, precision=hi).astype(jnp.int32)
        deltas = (jnp.minimum(a_sel - best, 4095) * 4096
                  + jnp.minimum(b_sel - best, 4095))
    elif cfg.subpixel:
        # only the parabola deltas leave the kernel; the float math runs
        # once over the (H, W) maps outside (the ~10 float ops per step
        # on lane-padded (M, 1) columns cost a full slab op each in
        # Mosaic). Both neighbours ride ONE packed roll-tree: lane d of
        # A/B holds S[d-1]/S[d+1], only lane d_int is unmasked, so the
        # lexicographic min IS the (S[dm], S[dp]) pair — a second tree
        # (the old per-neighbour masked reduce) is redundant. At the
        # search edge the rolls wrap; `interior` masking in the decode
        # discards those, and the caps keep the pack from overflowing
        # (real-column deltas are < 4096 by S_max < _BIGPACK there).
        A = _roll(S, 1, axis=1)    # lane d: S[d-1]
        B = _roll(S, -1, axis=1)   # lane d: S[d+1]
        cap = best + 4095
        pk = jnp.where(lane == d_int,
                       jnp.minimum(A, cap) * 4096 + jnp.minimum(B, cap),
                       1 << 30)
        m2 = _min_lanes_full(pk)[:, :1]
        deltas = m2 - best * 4097   # == (sm-best)*4096 + (sp-best)
    else:
        deltas = jnp.zeros((M, 1), jnp.int32)

    # incremental right-view WTA: lane i of amin accumulates column
    # x-i's diagonal; lane 0 is complete at this step
    A = jnp.minimum(amin, packed)
    d_r = A[:, 0:1] & ((1 << ps) - 1)
    amin_next = jnp.where(lane == D - 1, _BIGPACK << ps,
                          _roll(A, -1, axis=1))
    o1 = (valid.astype(jnp.int32) << (2 * ps)) + (d_int << ps) + d_r
    return o1, deltas, amin_next


def _bwd_wta_kernel(c_ref, s_ref, *rest, cfg, p1, p2_const, d_real,
                    w_real, R, has_p2m, p2_lm=False, mxu=True,
                    swar=False, bf16=False):
    """Grid step g = columns x in [xb, xb+R), xb = (G-1-g)*R, walked in
    descending order: runs the W (backward-horizontal) SGM step, completes S
    for each column, and does WTA + uniqueness + subpixel immediately — S
    never returns to HBM. The right-view disparity d_R(x) = argmin_d
    S(x+d, d) falls out of the same backward order with a rolling packed-min
    carry: column x's diagonal has received its d-th term at step x+d, so
    lane 0 completes exactly now (no shear needed). Outputs are written one
    column-lane at a time into (N, 128) blocks revisited across steps
    (callers keep the scan length a multiple of 128 and R | 128, so a
    step's columns never straddle an output block)."""
    idx = 0
    p2_ref = rest[idx] if has_p2m else None
    idx += 1 if has_p2m else 0
    o1_ref, o2_ref = rest[idx:idx + 2]
    carry_ref, amin_ref = rest[idx + 2:idx + 4]

    t = pl.program_id(0)
    G = pl.num_programs(0)
    N, D = s_ref.shape[1], s_ref.shape[2]  # swar carry is (N//2, D)
    xb = (G - 1 - t) * R
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, D), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
    Hh = N // 2
    laneH = jax.lax.broadcasted_iota(jnp.int32, (Hh, D), 1)

    @pl.when(t == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)
        amin_ref[...] = jnp.full((N, D), _BIGPACK << _pack_shift(D),
                                 jnp.int32)

    if p2_lm:
        # lane-major map (P2_LANE_MAJOR): column x at lane x % 128 of the
        # (N, 128) block; exact one-hot MXU extraction (see _sweep_kernel)
        lane128c = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

        def p2_read(x):
            oh = (lane128c == jax.lax.rem(x, 128)).astype(jnp.float32)
            return jnp.dot(p2_ref[0].astype(jnp.float32), oh,
                           precision=jax.lax.Precision.HIGHEST
                           ).astype(jnp.int32)

    for j in range(R - 1, -1, -1):
        x = xb + j
        c = c_ref[j].astype(jnp.int32)
        real = x < w_real  # scan axis may carry frame padding at the end

        if bf16:
            # native-bf16 recurrence (see SWEEP_BF16); WTA runs at full
            # width on the completed int32 S exactly as the v32 branch
            # (the (S << ps) + lane packing needs 19+ bits either way)
            cb = c.astype(jnp.bfloat16)
            if d_real < D:
                cb = jnp.where(lane >= d_real, jnp.bfloat16(_BF_BIG), cb)
            # lane-major adaptive maps: per-row P2' column (values <= p2
            # stay bf16-exact under the same c_max + p2 <= 255 gate)
            p2b = (p2_read(x).astype(jnp.bfloat16) if p2_lm
                   else p2_const)
            qn, L = _dir_step_bf16(carry_ref[...], cb, 0, None, lane,
                                   0, D, p1, p2b)
            S = s_ref[j].astype(jnp.int32) + L.astype(jnp.int32)
            o1, deltas, amin_next = _wta_from_S(S, amin_ref[...], lane, D,
                                                d_real, cfg, mxu)

            @pl.when(real)  # padded trailing steps must not touch state
            def _():
                carry_ref[...] = qn
                amin_ref[...] = amin_next
        elif swar:
            # 2x16 halves-packed SGM recurrence (dx = 0: no seam/OOB
            # machinery needed — see _sweep_kernel); the WTA value packing
            # needs 19 bits, so WTA runs per unpacked half instead, with
            # each half's right-WTA carry in its own amin_ref band
            cp = (c[:Hh] << 16) | c[Hh:]
            if d_real < D:
                cp = jnp.where(laneH >= d_real, (_BIG16 << 16) | _BIG16, cp)
            if p2_lm:
                # per-row adaptive P2' packed into the row-halves fields
                # (hi = row i, lo = row i + N/2, matching cp's pairing)
                p2c = p2_read(x)
                p2pk = (p2c[:Hh] << 16) | p2c[Hh:]
            else:
                p2pk = p2_const
            qn, L = _swar_sgm_step(carry_ref[...], cp, laneH, D, p1,
                                   p2pk)
            s32 = s_ref[j].astype(jnp.int32)
            o1h, o2h, amin_h = _wta_from_S(s32[:Hh] + (L >> 16),
                                           amin_ref[:Hh], laneH, D, d_real,
                                           cfg, mxu)
            o1l, o2l, amin_l = _wta_from_S(s32[Hh:] + (L & 0xFFFF),
                                           amin_ref[Hh:], laneH, D, d_real,
                                           cfg, mxu)
            o1 = jnp.concatenate([o1h, o1l], axis=0)
            deltas = jnp.concatenate([o2h, o2l], axis=0)

            @pl.when(real)  # padded trailing steps must not touch state
            def _():
                carry_ref[...] = qn
                amin_ref[:Hh] = amin_h
                amin_ref[Hh:] = amin_l
        else:
            if d_real < D:
                c = jnp.where(lane >= d_real, _BIG, c)
            # SGM backward-horizontal step (dx = 0), renormalised q carry
            q = carry_ref[...]
            up = _roll(q, -1, axis=1)
            up = jnp.where(lane == D - 1, _BIG, up)
            dn = _roll(q, 1, axis=1)
            dn = jnp.where(lane == 0, _BIG, dn)
            if p2_ref is not None and p2_lm:
                p2 = p2_read(x)
            elif p2_ref is not None:
                p2 = p2_ref[j][:, 0:1]
            else:
                p2 = p2_const
            cand = jnp.minimum(jnp.minimum(q, jnp.minimum(up, dn) + p1), p2)
            L = c + cand
            S = s_ref[j].astype(jnp.int32) + L          # final S column
            o1, deltas, amin_next = _wta_from_S(S, amin_ref[...], lane, D,
                                                d_real, cfg, mxu)

            @pl.when(real)  # padded trailing steps must not touch state
            def _():
                carry_ref[...] = L - _min_lanes_full(L)
                amin_ref[...] = amin_next

        # Mosaic cannot prove dynamic single-lane stores aligned; write via
        # a lane-masked read-modify-write of the (N, 128) block instead (the
        # block is revisited across steps, so this stays in VMEM).
        # out1 = valid<<16 | d_int<<8 | d_R; out2 = (sm-s0)<<12 | (sp-s0).
        xm = x % 128
        hit = lane128 == xm
        o1_ref[...] = jnp.where(hit, jnp.broadcast_to(o1, (N, 128)),
                                o1_ref[...])
        o2_ref[...] = jnp.where(hit, jnp.broadcast_to(deltas, (N, 128)),
                                o2_ref[...])


def sweep_bwd_wta(Ct: jnp.ndarray, St: jnp.ndarray, cfg: Config,
                  w_real: int, d_real: int,
                  p2_maps: jnp.ndarray | None = None,
                  rows_per_step: int = 0,
                  d_start: int = 0,
                  interpret: bool = False):
    """Backward-horizontal sweep over Ct (W, N, D) + fused WTA.

    St: partial path sums from the other 7 directions, same layout.
    Returns (disp float32, valid bool, d_r int32), each (N, Wx) with Wx =
    W rounded up to 128 — callers slice columns [:w_real] and transposed
    rows as needed. The kernel emits packed integer maps; the subpixel
    parabola floats are computed here from the packed deltas with exactly
    the golden ops (integer deltas <= 8*(C_max+P2) < 4096 are exact in
    f32, so the result is bit-identical to the in-kernel float version).

    min_disparity (`d_start`): the kernel is disparity-INDEX based and
    needs no change — plane j of Ct/St is hypothesis d_start + j (the cost
    kernel builds it that way); d_start only enters the float decode here
    (`disp` returns in TRUE units) while `d_r` stays the index map in the
    shifted-column convention d_r[x] = j_R(right col x - min_disparity):
    the rolling amin's lane 0 at step x completes right column
    x - min_disparity's diagonal min_j S(x_R + min_disparity + j, j).
    Both consumers (dr_consistency, lr_hits) only ever look it up at
    x - j_L, which lands at real completed columns — see
    `dr_consistency_pallas(d_start=...)`.
    """
    T, N, D = Ct.shape
    if rows_per_step <= 0:
        rows_per_step = BWD_ROWS
    # VMEM budget (see sgm_sweep): Ct + St slabs double-buffered + two
    # (N, D) scratch slabs + the revisited (N, 128) output blocks
    per_row = N * D * (Ct.dtype.itemsize + 2)
    fixed = 2 * 4 * N * D + 4 * 4 * N * 128
    if p2_maps is not None:
        if P2_LANE_MAJOR:
            fixed += 2 * 4 * N * 128     # dense lane-major block
        else:
            per_row += 4 * N * 128       # (R, N, 1) lane-pads to 128
    r_max = max(1, (12 * 1024 * 1024 - fixed) // max(1, 2 * per_row))
    # output blocks are 128 columns: a step must stay inside one, so R is
    # the largest power of two within budget (any power of two <= 128
    # divides a T that is a multiple of 128)
    R = 1
    if T % 128 == 0:
        while R * 2 <= min(rows_per_step, r_max, 128):
            R *= 2
    G = T // R
    Wx = _round_up(T, 128)

    def imap(g):
        return (G - 1 - g, 0, 0)

    def omap(g):
        return (0, ((G - 1 - g) * R) // 128)

    in_specs = [pl.BlockSpec((R, N, D), imap, memory_space=pltpu.VMEM),
                pl.BlockSpec((R, N, D), imap, memory_space=pltpu.VMEM)]
    operands = [Ct, St]
    p2_lm = False
    if p2_maps is not None:
        if P2_LANE_MAJOR:
            # dense lane-major block: column x at block x//128, lane x%128
            # (a step's R <= 128 columns never straddle a block — the same
            # invariant the output RMW blocks rely on)
            in_specs.append(pl.BlockSpec(
                (1, N, 128), lambda g: (((G - 1 - g) * R) // 128, 0, 0),
                memory_space=pltpu.VMEM))
            operands.append(_p2_lane_major(p2_maps)[0])
            p2_lm = True
        else:
            in_specs.append(pl.BlockSpec((R, N, 1), imap,
                                         memory_space=pltpu.VMEM))
            operands.append(p2_maps)

    # bf16 / SWAR gates for the embedded SGM recurrence (same constraints
    # as sgm_sweep; dx = 0 so no seam/OOB machinery is involved). The
    # census bound is the true c_max here — Ct always comes from the cost
    # kernel in this pipeline. Lane-major maps (p2_lm) deliver per-row
    # P2' as a plain (N, 1) column, so adaptive configs ride the packed
    # recurrences too (SWAR packs the halves' P2' into fields; bf16 takes
    # the column directly — r53).
    bf16 = (BWD_BF16 and (p2_maps is None or p2_lm)
            and N % 16 == 0 and cfg.max_census_cost + cfg.p2 <= 255
            and D <= 256)  # same VMEM bound as the sweeps (r44 OOM)
    swar = (not bf16 and SWEEP_SWAR and (p2_maps is None or p2_lm)
            and N % 16 == 0 and cfg.p1 + cfg.p2 + 256 < _BIG16)
    kernel = functools.partial(
        _bwd_wta_kernel, cfg=cfg, p1=cfg.p1, p2_const=cfg.p2,
        d_real=d_real, w_real=w_real, R=R, has_p2m=p2_maps is not None,
        p2_lm=p2_lm, mxu=MXU_REFINE, swar=swar, bf16=bf16)

    o1, o2 = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((N, 128), omap, memory_space=pltpu.VMEM),
                   pl.BlockSpec((N, 128), omap, memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((N, Wx), jnp.int32),
                   jax.ShapeDtypeStruct((N, Wx), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((N // 2 if swar else N, D),
                                   jnp.bfloat16 if bf16 else jnp.int32),
                        pltpu.VMEM((N, D), jnp.int32)],
        interpret=interpret,
    )(*operands)
    ps = _pack_shift(D)
    valid = o1 >= (1 << (2 * ps))
    d_int = (o1 >> ps) & ((1 << ps) - 1)
    d_r = o1 & ((1 << ps) - 1)
    # d_start added BEFORE the subpixel offset so the float add order
    # matches ops.wta exactly (float(d_int + d0) + offs — the other
    # association differs by 1 ULP)
    disp = (d_int + d_start).astype(jnp.float32)
    if cfg.subpixel:
        dm = (o2 >> 12).astype(jnp.float32)   # sm - s0
        dp = (o2 & 4095).astype(jnp.float32)  # sp - s0
        denom = dm + dp                        # == smf - 2*s0f + spf exactly
        offs = jnp.where(denom > 0,
                         (dm - dp) / jnp.maximum(2.0 * denom, 1e-9), 0.0)
        offs = jnp.clip(offs, -0.5, 0.5)
        interior = (d_int > 0) & (d_int < d_real - 1)
        disp = disp + jnp.where(interior, offs, 0.0)
    return disp, valid, d_r


def sgm_select_pallas(C: jnp.ndarray, cfg: Config, img: jnp.ndarray,
                      interpret: bool = False, dims=None, Ct=None,
                      frames: int = 1):
    """Aggregation + WTA + uniqueness + subpixel + right-disparity, fully
    fused: down/up sweeps accumulate S, the transposed fwd sweep adds the E
    paths, and the bwd sweep consumes S and emits per-pixel outputs — the
    completed S volume never round-trips HBM.

    C: the exact (H, W, D) volume, or — with dims=(H, W, D) — the padded
    sweep frame straight from census_cost_volume_pallas(padded=True)
    (saves the slice+pad relayout of the whole volume). Padded rows must be
    lane-uniform (zero) and padded columns lane-uniform (max_cost), so
    reverse scans entering through padding renormalise to an exact fresh
    path start before reaching real pixels.

    Returns (disp float32 (H, W), valid bool (H, W), d_r int32 (H, W));
    the d_L/d_R consistency comparison runs outside on the small maps
    (`ops.postproc.dr_consistency`). Bit-exact integer outputs vs the jnp
    ops; float disparity matches to ~1e-6 (Mosaic float rounding).

    disp is in TRUE units (cfg.min_disparity added to the index-unit
    kernel output); d_r is the INDEX map in the sweep_bwd_wta
    shifted-column convention — pass it to
    `dr_consistency_pallas(..., d_start=cfg.min_disparity)`.

    frames > 1 (requires dims + Ct from the multi-frame cost kernel):
    C holds F frames stacked on the row axis, Hp rows each. The vertical
    sweeps re-zero their carries at frame seams (exact per-frame path
    starts); the horizontal sweeps need no change at all — stacked frames
    occupy disjoint sublanes there, so their carries never interact. The
    payoff is per-op issue overhead: a lone KITTI frame gives the
    horizontal sweeps only ~47 sublane vregs per vector op, so op setup
    dominates; F frames fatten every slab F-fold for the same op count.
    Returns (F, H, W) maps.
    """
    if dims is None:
        assert frames == 1
        H, W, D = C.shape
        Hp = _round_up(H, 8)
        Wq = _round_up(W, 128)
        Dp = _round_up(D, 128)
        C = jnp.pad(C, ((0, Hp - H), (0, Wq - W), (0, Dp - D)))
    else:
        H, W, D = dims
        HF, Wq, Dp = C.shape
        Hp = HF // frames
    down = [(1, 0), (1, 1), (1, -1)] if cfg.paths == 8 else [(1, 0)]
    up = [(-1, 0), (-1, 1), (-1, -1)] if cfg.paths == 8 else [(-1, 0)]
    dxs_v = tuple(dx for _, dx in down)

    sweep = functools.partial(sgm_sweep, p1=cfg.p1, p2=cfg.p2, n_real=W,
                              d_real=D, frames=frames, interpret=interpret,
                              c_max=cfg.max_census_cost)
    # both vertical sweeps emit the horizontal-sweep layout directly
    # (rank-4 trick) — the standalone S transpose is gone from the hot
    # path; the fwd sweep absorbs the two partial volumes. Wide volumes
    # (true-Middlebury W) exceed the R=4 VMEM budget; they keep the
    # chained sweeps + external tile-transpose.
    from tpustereo.kernels.transpose_pallas import (transpose_hw_pallas,
                                                    transpose_sum_hw_pallas)
    fuse_t = EMIT_TRANSPOSED and emit_transposed_feasible(
        C.shape[0], Wq, Dp, len(dxs_v), frames)
    down_p2 = _p2_stack(img, down, cfg, False, C.shape[0], Wq)
    up_p2 = _p2_stack(img, up, cfg, False, C.shape[0], Wq)
    if fuse_t:
        St = (sweep(C, None, dxs_v, False, emit_transposed=True,
                    p2_maps=down_p2),
              sweep(C, None, dxs_v, True, emit_transposed=True,
                    p2_maps=up_p2))
    elif (BIDIR_VERT and not cfg.adaptive_p2
          and bidir_feasible(Wq, Dp, len(dxs_v),
                             SWEEP_SWAR and Wq % 16 == 0
                             and cfg.p1 + cfg.p2 + 256 < _BIG16)):
        Sd, Su = sgm_sweep_bidir(C, dxs_v, cfg.p1, cfg.p2, W, D,
                                 frames=frames, interpret=interpret)
        St = transpose_sum_hw_pallas(Sd, Su, interpret=interpret,
                                     trim=False)
    else:
        S = sweep(C, None, dxs_v, False, p2_maps=down_p2)
        S = sweep(C, S, dxs_v, True, p2_maps=up_p2)
        St = transpose_hw_pallas(S, interpret=interpret, trim=False)

    # horizontal-layout operands: Ct comes fused from the cost kernel when
    # the caller has it (with_transposed=True), else via the tile-transpose
    # kernel. The padded scan columns are inert: the fwd sweep reaches them
    # last, the bwd+WTA kernel skips its state updates for them
    # (`real` guard)
    if Ct is None:
        Ct = transpose_hw_pallas(C, interpret=interpret, trim=False)
    Tt, H8 = Ct.shape[0], Ct.shape[1]
    sweep_t = functools.partial(sgm_sweep, p1=cfg.p1, p2=cfg.p2, n_real=H,
                                d_real=D, interpret=interpret,
                                c_max=cfg.max_census_cost)
    St = sweep_t(Ct, St, (0,), False,
                 p2_maps=_p2_stack(img, [(0, 1)], cfg, True, Tt, H8))
    p2b = _p2_stack(img, [(0, -1)], cfg, True, Tt, H8)
    disp, valid, d_r = sweep_bwd_wta(Ct, St, cfg, w_real=W, d_real=D,
                                     p2_maps=p2b, interpret=interpret,
                                     d_start=cfg.min_disparity)
    if frames > 1:
        shp = (frames, Hp, disp.shape[1])
        return (disp.reshape(shp)[:, :H, :W],
                valid.reshape(shp)[:, :H, :W].astype(bool),
                d_r.reshape(shp)[:, :H, :W])
    return (disp[:H, :W], valid[:H, :W].astype(bool), d_r[:H, :W])


# ---------------------------------------------------------------------------
# full 8/4-path aggregation
# ---------------------------------------------------------------------------

def _p2_stack(img: jnp.ndarray, dirs, cfg: Config, transposed: bool,
              T_pad: int, N_pad: int) -> jnp.ndarray | None:
    """(T, N, K) adaptive-P2 maps for the fused directions, padded.

    img may be (F, H, W): frame-stacked pipelines (VERDICT r4 next #2) get
    per-frame `p2_map`s stacked in the volume's band layout — vertical:
    Hp-row bands along the scan axis; transposed: Hp-row bands along the
    sublane axis. Per-frame computation keeps gradients from reading
    across frames (identical to the scan-of-singles maps). Padding is
    zero, which is never consumed: at vertical frame seams the carry is
    re-zeroed so cand = min(q=0, ...) = 0 regardless of P2; padded sublane
    rows are row-independent; and padded scan columns' carries are
    fresh-start masked before reaching real columns (the `invalid` test in
    `_dir_step_*`)."""
    if not cfg.adaptive_p2:
        return None
    from tpustereo.ops.sgm import p2_map
    imgs = [img] if img.ndim == 2 else [img[f] for f in range(img.shape[0])]
    F = len(imgs)
    H, W = imgs[0].shape
    maps = []
    for dy, dx in dirs:
        ms = [p2_map(im, dy, dx, cfg) for im in imgs]
        if transposed:
            Hp = N_pad // F
            m = jnp.concatenate(
                [jnp.pad(mm.T, ((0, 0), (0, Hp - H))) for mm in ms], axis=1)
        else:
            Hp = T_pad // F
            m = jnp.concatenate(
                [jnp.pad(mm, ((0, Hp - H), (0, 0))) for mm in ms], axis=0)
        maps.append(m)
    st = jnp.stack(maps, axis=-1).astype(jnp.int32)
    return jnp.pad(st, ((0, T_pad - st.shape[0]), (0, N_pad - st.shape[1]),
                        (0, 0)))


def aggregate_pallas(C: jnp.ndarray, cfg: Config, img: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """S = Σ_r L_r over 4/8 directions; (H, W, D) int16.

    Drop-in replacement for `ops.sgm.aggregate` (bit-exact). Four fused
    sweeps: down {S,SE,SW} and up {N,NE,NW} over C, forward {E} and backward
    {W} over C^T; 4-path mode drops the diagonals from the vertical sweeps.
    """
    H, W, D = C.shape
    Dp = _round_up(D, 128)
    Wq = _round_up(W, 128)
    Hp = _round_up(H, 8)
    p1, p2 = cfg.p1, cfg.p2

    down = [(1, 0), (1, 1), (1, -1)] if cfg.paths == 8 else [(1, 0)]
    up = [(-1, 0), (-1, 1), (-1, -1)] if cfg.paths == 8 else [(-1, 0)]
    dxs_v = tuple(dx for _, dx in down)

    # vertical + diagonal sweeps in (H, W, D)
    Cv = jnp.pad(C, ((0, Hp - H), (0, Wq - W), (0, Dp - D)))
    sweep = functools.partial(sgm_sweep, p1=p1, p2=p2, n_real=W, d_real=D,
                              interpret=interpret,
                              c_max=cfg.max_census_cost)
    # the vertical sweeps hand S to the horizontal layout directly when
    # the rank-4 emission fits VMEM (see sgm_select_pallas)
    from tpustereo.kernels.transpose_pallas import transpose_hw_pallas
    down_p2 = _p2_stack(img, down, cfg, False, Hp, Wq)
    up_p2 = _p2_stack(img, up, cfg, False, Hp, Wq)
    if EMIT_TRANSPOSED and emit_transposed_feasible(Hp, Wq, Dp,
                                                    len(dxs_v)):
        St = (sweep(Cv, None, dxs_v, False, emit_transposed=True,
                    p2_maps=down_p2),
              sweep(Cv, None, dxs_v, True, emit_transposed=True,
                    p2_maps=up_p2))
    else:
        S = sweep(Cv, None, dxs_v, False, p2_maps=down_p2)
        S = sweep(Cv, S, dxs_v, True, p2_maps=up_p2)
        St = transpose_hw_pallas(S, interpret=interpret, trim=False)

    # horizontal sweeps in transposed layout (W, H, D). The padded scan
    # columns (T in [W, Wq)) are uniform zero, so the backward sweep's
    # carry renormalises to a fresh path start on entering the real region
    # — exact without masking.
    Ct = transpose_hw_pallas(Cv, interpret=interpret, trim=False)
    Tt, H8 = Ct.shape[0], Ct.shape[1]
    sweep_t = functools.partial(sgm_sweep, p1=p1, p2=p2, n_real=H, d_real=D,
                                interpret=interpret,
                                c_max=cfg.max_census_cost)
    St = sweep_t(Ct, St, (0,), False,
                 p2_maps=_p2_stack(img, [(0, 1)], cfg, True, Tt, H8))
    St = sweep_t(Ct, St, (0,), True,
                 p2_maps=_p2_stack(img, [(0, -1)], cfg, True, Tt, H8))
    return transpose_hw_pallas(St, interpret=interpret)[:H, :W, :D]
