"""Fused WTA + uniqueness + subpixel + LR-check Pallas kernel
(SURVEY.md §3 #6-7, §7 step 4).

Why: the jnp fallbacks express per-pixel lookups (S at d*±1, the LR diagonal
S(y, x+d, d), d_R at x-d_L) as plane slices/selects over the (H, W, D)
volume; with D on the minor dimension every plane slice re-reads whole
tiles, so XLA executes them at a fraction of useful bandwidth (measured
140 ms WTA + 79 ms LR at KITTI size). Here each grid step streams a
(2, W, D) slab through VMEM once and computes everything in-register:

* min + argmin via one packed (value*256 + d) lane-reduce (ties -> lowest
  d, matching np.argmin);
* uniqueness ratio via a masked second lane-reduce;
* S(d*±1) via masked lane-reduces at the clamped neighbour index;
* the LR diagonal S(y, x+d, d) via a log-shear — 7 lane-masked rolls along
  x turn the diagonal into a lane-reduce (the shear trick of SURVEY.md §7,
  applied to the re-index instead of the scan);
* d_R(x - d_L) via the same shear on the broadcast d_R column.

Mosaic constraints learned the hard way (kept here so they aren't
rediscovered): vector rotates exist only for 32-bit element types (int16
slabs fail with "Rotate with non-32-bit data"), reductions exist for int32
but not int16, and int32 slabs at 8 rows/step blow the 16 MB scoped-VMEM
budget — hence int32 slabs at 2 rows/step.

Bit-exact vs `ops.wta` + `ops.lr_check` (and therefore the golden oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpustereo.config import Config

_BIG = 1 << 20              # "infinite" but safe to pack (*256 fits int32)
_ROWS = 2                   # rows per grid step (VMEM budget, see docstring)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _min_lanes_full(x: jnp.ndarray) -> jnp.ndarray:
    """All-lanes min replicated to every lane via a log roll-tree (Mosaic's
    native lane reduce measured ~4x slower; see sgm_pallas). Minor axis
    128 or 256 wide (D=256 = two 128-lane vregs, one extra tree level)."""
    from tpustereo.kernels.sgm_pallas import _lane_bits
    for b in range(_lane_bits(x.shape[-1])):
        x = jnp.minimum(x, pltpu.roll(x, 1 << b, axis=x.ndim - 1))
    return x


def _shear(slab: jnp.ndarray, lane: jnp.ndarray, up: bool,
           bits: int = 7, extra: int = 0) -> jnp.ndarray:
    """Lane-dependent roll along axis 1: out[.., x, d] = slab[.., x+d+e, d]
    (up) or slab[.., x-d-e, d] (down) with e = `extra` (the min_disparity
    offset — one constant roll), wrapping mod W — callers mask the wrap.
    pltpu.roll(x, s)[i] = x[i-s], so 'up' composes rolls of W - 2^b.
    bits: tree depth — 7 covers D <= 128, 8 covers D <= 256."""
    W = slab.shape[1]
    if extra:
        slab = pltpu.roll(slab, ((W - extra) if up else extra) % W, axis=1)
    for b in range(bits):
        sh = (W - (1 << b)) % W if up else (1 << b)
        rolled = pltpu.roll(slab, sh, axis=1)
        slab = jnp.where(((lane >> b) & 1) == 1, rolled, slab)
    return slab


def _kernel(s_ref, disp_ref, valid_ref, *, cfg: Config, w_real: int,
            d_real: int, mxu: bool):
    from tpustereo.kernels.sgm_pallas import _pack_shift
    R, W, D = s_ref.shape
    d0 = cfg.min_disparity
    bits = (D - 1).bit_length()
    ps = _pack_shift(D)
    mask = (1 << ps) - 1
    s = s_ref[...].astype(jnp.int32)                    # (R, W, D)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, W, D), 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, W, 1), 1)
    if d_real < D:
        s = jnp.where(lane >= d_real, _BIG, s)

    # one-hot extraction / counting as a lane SUM on the MXU (see
    # sgm_pallas.MXU_REFINE): exact at Precision.HIGHEST for values < 2^24
    ones = jnp.ones((D, 1), jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    def pick(values, where_mask):
        return jnp.dot(jnp.where(where_mask, values, 0).astype(jnp.float32),
                       ones, precision=hi).astype(jnp.int32)

    m = _min_lanes_full((s << ps) + lane)[..., :1]      # (R, W, 1)
    best = m >> ps
    d_int = m & mask

    valid = col < w_real
    if cfg.uniqueness_ratio > 0 and mxu:
        viol = ((jnp.abs(lane - d_int) > 1)
                & (s * 100 < best * (100 + cfg.uniqueness_ratio)))
        valid &= pick(1, viol) == 0
    elif cfg.uniqueness_ratio > 0:
        masked = jnp.where(jnp.abs(lane - d_int) <= 1, _BIG << ps, s)
        second = _min_lanes_full(masked)[..., :1]
        valid &= ~(second * 100 < best * (100 + cfg.uniqueness_ratio))

    # d0 added BEFORE the subpixel offset: float(d_int + d0) + offs is the
    # ops.wta association (the other order differs by 1 ULP)
    disp = (d_int + d0).astype(jnp.float32)
    if cfg.subpixel:
        dm = jnp.maximum(d_int - 1, 0)
        dp = jnp.minimum(d_int + 1, d_real - 1)
        if mxu:
            sm = pick(s, lane == dm)
            sp = pick(s, lane == dp)
        else:
            sm = _min_lanes_full(jnp.where(lane == dm, s,
                                           _BIG << ps))[..., :1]
            sp = _min_lanes_full(jnp.where(lane == dp, s,
                                           _BIG << ps))[..., :1]
        smf, spf = sm.astype(jnp.float32), sp.astype(jnp.float32)
        s0 = best.astype(jnp.float32)
        denom = smf - 2.0 * s0 + spf
        offs = jnp.where(denom > 0,
                         (smf - spf) / jnp.maximum(2.0 * denom, 1e-9), 0.0)
        offs = jnp.clip(offs, -0.5, 0.5)
        interior = (d_int > 0) & (d_int < d_real - 1)
        disp = disp + jnp.where(interior, offs, 0.0)

    if cfg.disp12_max_diff >= 0:
        # right-view WTA: d_R(x) = argmin_j S(x+d0+j, j) via up-shear (all
        # index units; d0 = min_disparity rides the shear's constant roll)
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (R, W, D), 1)
        diag = _shear(s, lane, up=True, bits=bits, extra=d0)
        diag = jnp.where(lane_w + lane + d0 > w_real - 1, _BIG, diag)
        mr = _min_lanes_full((diag << ps) + lane)[..., :1]
        d_r = mr & mask                                  # (R, W, 1)
        # d_R at x - d_L = x - d0 - j_L via down-shear of the broadcast
        # d_R column; out-of-image (x - d_L < 0) fails the check exactly
        # like the jnp fallback's _BIG fill
        G = _shear(jnp.broadcast_to(d_r, (R, W, D)), lane, up=False,
                   bits=bits, extra=d0)
        G = jnp.where(lane_w - lane - d0 < 0, (1 << 12), G)
        dl = jnp.round(disp).astype(jnp.int32) - d0      # (R, W, 1) index
        if mxu:
            dr_at = pick(G, lane == dl)
        else:
            dr_at = _min_lanes_full(jnp.where(lane == dl, G,
                                              _BIG))[..., :1]
        valid &= (col - d0 >= dl) & (jnp.abs(dl - dr_at)
                                     <= cfg.disp12_max_diff)

    disp_ref[0] = disp[..., 0]
    valid_ref[0] = valid[..., 0].astype(jnp.int32)


def wta_lr_pallas(S: jnp.ndarray, cfg: Config, interpret: bool = False,
                  dims=None, frames: int = 1):
    """S: (H, W, D) int -> (disp float32 (H, W), valid bool (H, W)).

    Fuses `ops.wta` and `ops.lr_check` (bit-exact vs both); one pass over S.

    dims=(H, W, D): S is the padded uint8 frame straight from
    census_cost_volume_pallas(padded=True). At Middlebury geometry the
    slice + int16 cast + re-pad of the volume were three full-volume
    relayout passes that dominated the census_wta pipeline; the kernel
    reads the frame directly instead (safe: census costs <= 64 < 128, so
    the Mosaic unsigned-widening hazard cannot trigger, and the shears'
    w_real masks already cover arbitrary column padding).

    frames > 1 (requires dims): S holds F frames stacked on the row axis
    (Hp rows each, from the multi-frame cost kernel). Every per-pixel
    quantity here is row-local, so stacking is exact by construction;
    returns (F, H, W) maps from one launch set.
    """
    if dims is None:
        assert frames == 1
        H, W, D = S.shape
        Dp = _round_up(D, 128)
        Wp = _round_up(W, 16)
        Hp = _round_up(H, _ROWS)
        Sp = jnp.pad(S.astype(jnp.int16),
                     ((0, Hp - H), (0, Wp - W), (0, Dp - D)))
    else:
        H, W, D = dims
        HF, Wp, Dp = S.shape
        Hp = HF // frames
        Sp = S

    from tpustereo.kernels import sgm_pallas
    # int32 shear temps scale with R*Wp*Dp: keep R*Wp*(Dp/128) at the
    # proven 2x2048 budget (D > 128 volumes take single-row steps)
    rows = _ROWS if Wp * (Dp // 128) <= 2048 else 1
    kernel = functools.partial(_kernel, cfg=cfg, w_real=W, d_real=D,
                               mxu=sgm_pallas.MXU_REFINE)
    G = frames * Hp // rows
    # outputs are (G, R, Wp) so the block's trailing dims (R, Wp) equal the
    # array dims (Mosaic's tiling rule); reshaped to (Hp, Wp) after.
    disp, valid = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((rows, Wp, Dp), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, rows, Wp), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, rows, Wp), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((G, rows, Wp), jnp.float32),
                   jax.ShapeDtypeStruct((G, rows, Wp), jnp.int32)),
        interpret=interpret,
    )(Sp)
    if frames > 1:
        disp = disp.reshape(frames, Hp, Wp)
        valid = valid.reshape(frames, Hp, Wp)
        return disp[:, :H, :W], valid[:, :H, :W].astype(bool)
    disp = disp.reshape(Hp, Wp)
    valid = valid.reshape(Hp, Wp)
    return disp[:H, :W], valid[:H, :W].astype(bool)
