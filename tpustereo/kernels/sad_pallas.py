"""Fused SAD block-matching + WTA as a plane-sweep Pallas kernel
(SURVEY.md §3 #2; VERDICT r4 next #1 — config 1 must beat, not tie, the
CPU reference).

Why a kernel: the jnp `ops.sad_volume` + `wta_lr_pallas` path materialises
the (H, W, D) volume in HBM (log-shear + binary window sums ≈ 15 relayout
passes over ~28 MB at Tsukuba size) and then streams it again through the
WTA kernel — at 288×384 the whole frame is bandwidth/overhead, not compute
(r47 decomposition). Here the DISPARITY is the grid axis and the slab is
the whole padded image: one (band, Wq) diff plane per step, box-summed
in-register (separable binary window sums over sublane/lane rolls), folded
into running packed-min carries. The S volume never exists anywhere.

Per-plane recurrences (all carries live in VMEM scratch across steps):
* WTA: M = min(M, (S_j << ps) + j) — ties break toward the lowest plane
  exactly like np.argmin (golden.wta_numpy).
* right-view WTA (LR check): A = min(roll(A, +1 lane), masked packed) —
  the d_R(x_R) = argmin_j S(x_R + d, j) diagonal falls out of one
  incremental lane roll (contribution at lane x ends at lane x + D-1-j,
  so final lane L holds right column L - (D-1) - d_start; a static decode
  roll gives the `sweep_bwd_wta` shifted-column convention that
  `dr_consistency_pallas` consumes).
* pass 2 (uniqueness + subpixel, once M is final): m2 = min over planes
  with |j - d*| > 1 (the ops.wta exclusion window, same _BIG sentinel),
  and S[d*∓1] captured by plane-index equality at the CLAMPED neighbour
  indices (max(d*-1, 0) / min(d*+1, D-1) — fires at the argmin plane
  itself at the search edge, reproducing ops.wta's clamped reads exactly;
  both values pack one int32, fields < 2^15 for block <= 11).

The right image plane for hypothesis d_start + j comes from ONE static
+1 lane roll per step of a VMEM scratch copy (r[x - d]); Mosaic gets no
dynamic shift amounts. Inputs are EDGE-padded images (pad-then-diff equals
golden's diff-then-edge-pad because both images replicate the same rows/
cols), int32 on the wire (the unsigned-widening rule). The x - d < 0
out-of-window fill (255) applies at the REPLICATION coordinate
clamp(x, 0, W-1), matching golden's pad of the filled volume.

Frame stacking: F frames ride one launch as F consecutive grid segments
(carries re-init per frame; per-frame input/output blocks), amortising
launch overhead with zero cross-frame interaction by construction.

Bit-exact vs `ops.sad_volume` + `ops.wta` + `ops.lr_check` (and therefore
golden.sad_volume_numpy/wta_numpy); float subpixel decode runs outside the
kernel on (H, W) maps with exactly the ops.wta float op order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpustereo.config import Config

_BIG = 1 << 24       # ops.wta's uniqueness sentinel (second*100 fits int32)
_BIGDR = 1 << 20     # ops.postproc._right_disparity's OOB fill


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _roll(x, shift: int, axis: int):
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _win_sum(x, block: int, axis: int):
    """out[i] = sum x[i .. i+block-1] along axis (binary decomposition,
    same scheme as ops.sad._window_sum; wrap positions never land in kept
    slab regions — see the caller's geometry notes)."""
    sums = {1: x}
    k = 1
    while k * 2 <= block:
        sums[k * 2] = sums[k] + _roll(sums[k], -k, axis=axis)
        k *= 2
    acc, off = None, 0
    for k in sorted(sums, reverse=True):
        if block & k:
            part = _roll(sums[k], -off, axis=axis) if off else sums[k]
            acc = part if acc is None else acc + part
            off += k
    return acc


def sad_fused_feasible(H: int, W: int, D: int, block: int,
                       with_dr: bool) -> bool:
    """Scoped-VMEM gate: ~17 live (band, Wq) int32 slabs (5 scratch
    carries, 2x double-buffered L/R input blocks, 4 outputs at 2x) must
    fit the ~14 MB budget; lane rolls are proven to Wq ~1536."""
    r = block // 2
    band = _round_up(H + block - 1, 8)
    Wq = _round_up(max(W + 2 * r, (W + D - 1) if with_dr else 0), 128)
    return Wq <= 1536 and 17 * band * Wq * 4 <= 14 * 1024 * 1024


def _kernel(l_ref, r_ref, m_ref, m2_ref, o2_ref, a_ref,
            rr_ref, mc_ref, m2c_ref, spc_ref, ac_ref, *,
            H, W, D, block, d_start, ps, with_dr, two_pass):
    t = pl.program_id(0)
    steps = (2 if two_pass else 1) * D
    tf = jax.lax.rem(t, steps)          # step within this frame's segment
    j = jax.lax.rem(tf, D)              # plane index
    is_p2 = tf >= D                     # pass-2 step (uniqueness/subpixel)
    band, Wq = l_ref.shape[1], l_ref.shape[2]
    r = block // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (band, Wq), 1)
    d_true = d_start + j

    # --- per-frame carry init + the rolled right plane -----------------
    @pl.when(tf == 0)
    def _():
        mc_ref[...] = jnp.full((band, Wq), (_BIGDR << ps), jnp.int32)
        m2c_ref[...] = jnp.full((band, Wq), _BIG, jnp.int32)
        spc_ref[...] = jnp.zeros((band, Wq), jnp.int32)
        if with_dr:
            ac_ref[...] = jnp.full((band, Wq), (_BIGDR << ps), jnp.int32)

    @pl.when(j == 0)
    def _():
        rr_ref[...] = _roll(r_ref[0], d_start, axis=1)

    @pl.when(j != 0)
    def _():
        rr_ref[...] = _roll(rr_ref[...], 1, axis=1)

    # --- S_j: |L - R>>d| with the x-d<0 fill, box-summed ----------------
    # diff-slab lane l holds image col l - r; the fill applies at the
    # replication coordinate clamp(col, 0, W-1) (golden pads the FILLED
    # volume with edge mode, so replicated cols inherit col 0/W-1's fill)
    col = lane - r
    colc = jnp.clip(col, 0, W - 1)
    A = jnp.abs(l_ref[0] - rr_ref[...])
    A = jnp.where(colc < d_true, 255, A)
    # golden edge-pads the FILLED diff volume. Pad-then-diff reproduces
    # that on the left/vertical edges (both images replicate the same
    # rows/cols) but NOT on the right: r_pad(x - d) replicates col W-1,
    # where A's replication needs r(W-1-d). Rebuild the right pad lanes by
    # propagating the last real diff column outward (r roll-selects).
    for _ in range(r):
        A = jnp.where(col > W - 1, _roll(A, 1, axis=1), A)
    S = _win_sum(_win_sum(A, block, 0), block, 1)
    # window-output lane l / sublane i now sit at image col l / row i

    packed = (S << ps) + j

    @pl.when(~is_p2)
    def _():
        mc_ref[...] = jnp.minimum(mc_ref[...], packed)
        if with_dr:
            # contribution at lane x belongs to right col x - d_true; mask
            # out-of-image diagonals to the _right_disparity big fill
            # (ties among all-big columns then decode to plane 0, exactly
            # like the golden packed argmin over the big-filled shear)
            okd = (lane >= d_true) & (lane < W)
            pk = jnp.where(okd, packed, (_BIGDR << ps) + j)
            ac_ref[...] = jnp.minimum(_roll(ac_ref[...], 1, axis=1), pk)

    if two_pass:
        @pl.when(is_p2)
        def _():
            d_int = mc_ref[...] & ((1 << ps) - 1)
            # uniqueness: min outside the |j - d*| <= 1 window (ops.wta)
            m2c_ref[...] = jnp.minimum(
                m2c_ref[...],
                jnp.where(jnp.abs(j - d_int) > 1, S, _BIG))
            # subpixel neighbours at the CLAMPED indices; hi=S[dm], lo=S[dp]
            sp = spc_ref[...]
            fire_m = j == jnp.maximum(d_int - 1, 0)
            sp = jnp.where(fire_m, (S << 16) | (sp & 0xFFFF), sp)
            fire_p = j == jnp.minimum(d_int + 1, D - 1)
            sp = jnp.where(fire_p, ((sp >> 16) << 16) | S, sp)
            spc_ref[...] = sp

    # --- emit once per frame -------------------------------------------
    @pl.when(tf == steps - 1)
    def _():
        m_ref[0] = mc_ref[...]
        m2_ref[0] = m2c_ref[...]
        o2_ref[0] = spc_ref[...]
        if with_dr:
            a_ref[0] = ac_ref[...]


def sad_wta_pallas(left: jnp.ndarray, right: jnp.ndarray, cfg: Config,
                   interpret: bool = False):
    """(H, W) or (F, H, W) uint8 ×2 -> (disp f32, valid bool, d_r int32).

    disp in TRUE units (min_disparity added, subpixel applied), valid is
    the uniqueness mask, d_r the right-disparity INDEX map in the
    sweep_bwd_wta shifted-column convention (feed dr_consistency_pallas
    with d_start=cfg.min_disparity), or None when disp12_max_diff < 0.
    Maps are (H, W) / (F, H, W) matching the input rank."""
    single = left.ndim == 2
    if single:
        left, right = left[None], right[None]
    F, H, W = left.shape
    D = cfg.num_disparities
    block = cfg.sad_block
    d_start = cfg.min_disparity
    with_dr = cfg.disp12_max_diff >= 0
    r = block // 2
    band = _round_up(H + block - 1, 8)
    Wq = _round_up(max(W + 2 * r, (W + D - 1) if with_dr else 0), 128)
    ps = max(1, (D - 1).bit_length())   # S < 2^15 (block <= 11), ps <= 10
    two_pass = cfg.uniqueness_ratio > 0 or cfg.subpixel
    steps = (2 if two_pass else 1) * D

    def prep(img):
        p = jnp.pad(img, ((0, 0), (r, band - H - r), (r, r)), mode="edge")
        p = jnp.pad(p, ((0, 0), (0, 0), (0, Wq - p.shape[2])))
        return p.astype(jnp.int32)

    kernel = functools.partial(_kernel, H=H, W=W, D=D, block=block,
                               d_start=d_start, ps=ps, with_dr=with_dr,
                               two_pass=two_pass)
    spec = pl.BlockSpec((1, band, Wq), lambda t: (t // steps, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((F, band, Wq), jnp.int32)
    scratch = pltpu.VMEM((band, Wq), jnp.int32)
    M, m2, o2, Adr = pl.pallas_call(
        kernel,
        grid=(F * steps,),
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec, spec),
        out_shape=(shape, shape, shape, shape),
        scratch_shapes=[scratch] * 5,
        interpret=interpret,
    )(prep(left), prep(right))

    mask = (1 << ps) - 1
    best = M >> ps
    j_int = M & mask
    valid = jnp.ones((F, band, Wq), bool)
    if cfg.uniqueness_ratio > 0:
        valid &= ~(m2 * 100 < best * (100 + cfg.uniqueness_ratio))
    # float decode with exactly the ops.wta op order/association
    disp = (j_int + jnp.int32(d_start)).astype(jnp.float32)
    if cfg.subpixel:
        smf = (o2 >> 16).astype(jnp.float32)
        spf = (o2 & 0xFFFF).astype(jnp.float32)
        s0 = best.astype(jnp.float32)
        denom = smf - 2.0 * s0 + spf
        offs = jnp.where(denom > 0,
                         (smf - spf) / jnp.maximum(2.0 * denom, 1e-9), 0.0)
        offs = jnp.clip(offs, -0.5, 0.5)
        interior = (j_int > 0) & (j_int < D - 1)
        disp = disp + jnp.where(interior, offs, 0.0)
    d_rs = None
    if with_dr:
        # final lane L holds right col L - (D-1); dr_consistency_pallas's
        # shifted convention wants j_R(x - d_start) at x, which sits at
        # lane x + D - 1 for any d_start (the d_start shift cancels)
        d_rs = (jnp.roll(Adr, -(D - 1), axis=2) & mask)[:, :H, :W]
    disp = disp[:, :H, :W]
    valid = valid[:, :H, :W]
    if single:
        disp, valid = disp[0], valid[0]
        d_rs = None if d_rs is None else d_rs[0]
    return disp, valid, d_rs
