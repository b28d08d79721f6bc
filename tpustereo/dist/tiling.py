"""Spatial strip tiling over the mesh 'strip' axis — the sequence-parallel
analog of this workload (SURVEY.md §3 #16, §4.3, §5.7).

Rows are sharded across chips. Horizontal SGM paths are strip-local and
embarrassingly parallel; vertical/diagonal paths cross strips and come in
two modes:

* **halo approximation** (default, scalable): each chip scans an extended
  strip with `cfg.halo` rows exchanged from its neighbours over ICI
  (`lax.ppermute`) and discards the halo. Path influence decays because of
  the SGM renormalisation term, so a 32–64 row halo reproduces interior
  costs to within quantisation — the halo-size/accuracy tradeoff is
  *measured* in tests/test_dist.py, not assumed.
* **exact ring hand-off** (`cfg.exact_tiling`): the (W, D) carry slab is
  ppermuted strip-to-strip (the ring-attention analog). Bit-exact with the
  untiled pipeline at any strip count; the y-scanning directions serialise
  across strips, so it is the correctness fallback, not the fast path.

Post-processing (speckle components, median) legitimately crosses strips but
operates on the tiny (H, W) disparity map, so both modes all_gather the
per-strip disparity+validity (a few MB) and run post-processing globally —
bit-exact with untiled postproc by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpustereo.config import Config
from tpustereo.ops import census, cost_volume, lr_check, median3, sad_volume, speckle, wta
from tpustereo.ops.sgm import DIRS_4, DIRS_8, aggregate_path, p2_map
from tpustereo.pipeline.sgbm import INVALID

_BIG = 1 << 24  # plain int: module import must not initialise the backend
AXIS = "strip"


def _effective_halo(cfg: Config, strip_rows: int, ry: int) -> int:
    """Halo rows actually exchanged: at least the census margin, at most the
    strip height (one-hop ppermute reaches only the adjacent strip). Warns
    when the requested halo is silently shrunk — at high strip counts the
    halo approximation degrades with no other signal (use fewer strips or
    exact_tiling=True)."""
    h = min(max(cfg.halo, ry), strip_rows)
    if h < cfg.halo:
        import warnings
        warnings.warn(
            f"halo {cfg.halo} clamped to strip height {strip_rows}: the "
            "halo approximation loses accuracy; use fewer strips or "
            "exact_tiling=True", stacklevel=3)
    return h


# ---------------------------------------------------------------------------
# halo exchange
# ---------------------------------------------------------------------------

def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str = AXIS) -> jnp.ndarray:
    """(Hs, ...) local strip -> (Hs + 2*halo, ...) extended strip.

    Neighbour rows via ppermute over ICI; boundary chips (no neighbour)
    fill with edge replication, matching the untiled pipeline's border
    convention (census pads with edge replication; for SGM it makes halo
    paths start in replicated rows — part of the measured approximation).
    """
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    top, bot = x[:halo], x[-halo:]
    from_above = lax.ppermute(bot, axis_name, [(k, k + 1) for k in range(n - 1)])
    from_below = lax.ppermute(top, axis_name, [(k + 1, k) for k in range(n - 1)])
    rep_top = jnp.broadcast_to(x[:1], from_above.shape)
    rep_bot = jnp.broadcast_to(x[-1:], from_below.shape)
    from_above = jnp.where(i == 0, rep_top, from_above)
    from_below = jnp.where(i == n - 1, rep_bot, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=0)


def _zero_oob_rows(C: jnp.ndarray, halo: int, strip_rows: int, n_real: int,
                   axis_name: str = AXIS) -> jnp.ndarray:
    """Zero cost rows whose global image row falls outside [0, n_real).

    Covers both boundary-chip halo rows and bottom padding rows (H not
    divisible by the strip count pads the image; see sgbm_tiled). A
    uniform-zero cost row is an *exact* fresh path start for the y-scanning
    SGM directions: with a lane-uniform carry, cand = min(q, q±1+P1, P2) is
    uniform, so L = 0 + cand renormalises to q = 0 — the state an untiled
    sweep has at the true image edge. (Edge-replicated *image* rows would
    instead accumulate rows of path bias.)
    """
    i = lax.axis_index(axis_name)
    g = i * strip_rows - halo + jnp.arange(C.shape[0])[:, None, None]
    oob = (g < 0) | (g >= n_real)
    return jnp.where(oob, jnp.zeros((), C.dtype), C)


# ---------------------------------------------------------------------------
# exact ring carry hand-off
# ---------------------------------------------------------------------------

def _ring_path(C_loc, dy, dx, cfg: Config, p2m_loc, axis_name: str = AXIS):
    """Exact L_r for a y-scanning direction with carry hand-off.

    SPMD ring (§4.3b): at ring step s, the chip owning strip s (in path
    order) scans with the carry received from its predecessor and forwards
    its final carry. All chips execute every step (SPMD); a chip keeps the
    result of its own turn. An all-BIG carry is arithmetically identical to
    a path start (L collapses to C), so strip 0 needs no special case.
    """
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    W, D = C_loc.shape[1], C_loc.shape[2]
    down = dy > 0  # path order: top strip first for dy>0
    perm = ([(k, k + 1) for k in range(n - 1)] if down
            else [(k + 1, k) for k in range(n - 1)])

    def body(s, state):
        carry, out = state
        L, fin = aggregate_path(C_loc, dy, dx, cfg, img=None, p2m=p2m_loc,
                                init_carry=carry, return_carry=True)
        turn = s if down else n - 1 - s
        mine = (i == turn)
        out = jnp.where(mine, L, out)
        carry = lax.ppermute(jnp.where(mine, fin, _BIG), axis_name, perm)
        return carry, out

    # Derive the inits from C_loc so the loop carry has the same
    # varying-manual-axes type as the body output under shard_map (plain
    # constants are 'unvarying' and fail scan's carry typing).
    init = (C_loc[0].astype(jnp.int32) * 0 + _BIG,
            jnp.zeros(C_loc.shape, jnp.int16) + C_loc.astype(jnp.int16) * 0)
    _, out = lax.fori_loop(0, n, body, init)
    return out


def _aggregate_tiled_exact(C_loc, img_ext, ry: int, cfg: Config):
    """S on the local strip, exact at any strip count.

    C_loc: (Hs, W, D) exact local cost rows (built from a census-halo
    extended strip). Horizontal paths are strip-local; y-scanning paths use
    the ring. Adaptive-P2 maps are computed on the extended image and
    cropped so boundary rows see the true neighbour gradient.
    """
    Hs = C_loc.shape[0]
    dirs = DIRS_4 if cfg.paths == 4 else DIRS_8
    S = jnp.zeros(C_loc.shape, jnp.int16)
    for dy, dx in dirs:
        p2e = p2_map(img_ext, dy, dx, cfg)
        p2l = p2e[ry:ry + Hs]
        if dy == 0:
            S = S + aggregate_path(C_loc, dy, dx, cfg, img=None, p2m=p2l)
        else:
            S = S + _ring_path(C_loc, dy, dx, cfg, p2l)
    return S


# ---------------------------------------------------------------------------
# tiled pipeline
# ---------------------------------------------------------------------------

def _volume_local(left_loc, right_loc, cfg: Config, n_real: int):
    """Aggregated volume S for the local strip (halo or exact mode).
    n_real: true image height — rows at or past it are bottom padding."""
    ch = cfg.census_window[0]
    ry = ch // 2
    Hs = left_loc.shape[0]
    if cfg.mode == "sad":
        r = cfg.sad_block // 2
        ext_l = halo_exchange(left_loc, r)
        ext_r = halo_exchange(right_loc, r)
        S = sad_volume(ext_l, ext_r, cfg.num_disparities, cfg.sad_block,
                       d_start=cfg.min_disparity)
        return S[r:S.shape[0] - r]
    if cfg.mode == "census_wta" or cfg.exact_tiling:
        # census needs only the window margin; exact thereafter
        ext_l = halo_exchange(left_loc, ry)
        ext_r = halo_exchange(right_loc, ry)
        C = cost_volume(census(ext_l, cfg.census_window),
                        census(ext_r, cfg.census_window),
                        cfg.num_disparities, cfg.max_census_cost,
                        d_start=cfg.min_disparity)
        C_loc = _zero_oob_rows(C[ry:C.shape[0] - ry], 0, Hs, n_real)
        if cfg.mode == "census_wta":
            return C_loc.astype(jnp.int16)
        return _aggregate_tiled_exact(C_loc, ext_l, ry, cfg)
    # halo-approximate SGM; out-of-image rows (boundary halos + bottom
    # padding) get exact fresh-start zero cost — see _zero_oob_rows
    h = _effective_halo(cfg, Hs, ry)
    ext_l = halo_exchange(left_loc, h)
    ext_r = halo_exchange(right_loc, h)
    C = cost_volume(census(ext_l, cfg.census_window),
                    census(ext_r, cfg.census_window),
                    cfg.num_disparities, cfg.max_census_cost,
                    d_start=cfg.min_disparity)
    C = _zero_oob_rows(C, h, Hs, n_real)
    from tpustereo.pipeline.sgbm import _pallas_mode
    mode = _pallas_mode(cfg)
    if mode != "off":
        from tpustereo.kernels import aggregate_pallas
        S = aggregate_pallas(C, cfg, ext_l, interpret=(mode == "interpret"))
    else:
        dirs = DIRS_4 if cfg.paths == 4 else DIRS_8
        S = jnp.zeros(C.shape, jnp.int16)
        for dy, dx in dirs:
            S = S + aggregate_path(C, dy, dx, cfg, ext_l)
    return S[h:S.shape[0] - h]


def _sgbm_strip_fused(left_loc, right_loc, cfg: Config, n_real: int,
                      interp: bool):
    """Halo-mode strip body on the fused kernel path: extended-strip cost
    kernel -> sgm_select (sweeps + WTA + d_R in one pass) -> discard halo
    rows -> strip-local d_L/d_R consistency. Identical math to the jnp
    halo branch (WTA and the LR re-index are row-local, so selecting on
    the extended strip then slicing equals slicing S then selecting)."""
    from tpustereo.kernels import (census_cost_volume_pallas,
                                   dr_consistency_pallas, sgm_select_pallas)
    ry = cfg.census_window[0] // 2
    h = _effective_halo(cfg, left_loc.shape[0], ry)
    ext_l = halo_exchange(left_loc, h)
    ext_r = halo_exchange(right_loc, h)
    He, W = ext_l.shape
    # padded sweep-ready frame (no volume slice/pad copy); padded rows are
    # already zero, out-of-image halo/bottom rows are zeroed on top (exact
    # fresh path starts) — see _zero_oob_rows
    C = census_cost_volume_pallas(ext_l, ext_r, cfg.num_disparities,
                                  cfg.max_census_cost, cfg.census_window,
                                  interpret=interp, padded=True,
                                  d_start=cfg.min_disparity)
    C = _zero_oob_rows(C, h, left_loc.shape[0], n_real)
    disp_e, valid_e, dr_e = sgm_select_pallas(
        C, cfg, ext_l, interpret=interp, dims=(He, W, cfg.num_disparities))
    sl = slice(h, disp_e.shape[0] - h)
    disp, valid, d_r = disp_e[sl], valid_e[sl], dr_e[sl]
    if cfg.disp12_max_diff >= 0:
        valid &= dr_consistency_pallas(d_r, disp, cfg.num_disparities,
                                       cfg.disp12_max_diff, interpret=interp,
                                       d_start=cfg.min_disparity)
    return disp, valid, _strip_hits(d_r, cfg)


def _ring_sweep_pallas(Cv, dxs, reverse: bool, cfg: Config, w_real: int,
                       d_real: int, p2m, interp: bool,
                       axis_name: str = AXIS):
    """Exact ring hand-off riding the Pallas sweep kernels.

    Same SPMD ring as `_ring_path`, but one kernel launch sweeps all the
    fused same-sign directions and the hand-off slab is the (K, N, D)
    q-form carry (the recurrence depends on the predecessor row only
    through q = L - min_d L, so the renormalised slab is the exact state —
    see kernels.sgm_pallas._sweep_kernel). Bit-exact with the untiled
    kernels at any strip count; the y-scans serialise across strips."""
    from tpustereo.kernels import sgm_sweep
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    T, N, D = Cv.shape
    K = len(dxs)
    down = not reverse
    perm = ([(k, k + 1) for k in range(n - 1)] if down
            else [(k + 1, k) for k in range(n - 1)])

    def body(s, state):
        carry, out = state
        res, fin = sgm_sweep(Cv, None, dxs, reverse, p1=cfg.p1, p2=cfg.p2,
                             n_real=w_real, d_real=d_real, p2_maps=p2m,
                             init_carry=carry, return_final_carry=True,
                             interpret=interp, c_max=cfg.max_census_cost)
        turn = s if down else n - 1 - s
        mine = i == turn
        out = jnp.where(mine, res, out)
        carry = lax.ppermute(jnp.where(mine, fin, 0), axis_name, perm)
        return carry, out

    # zero q-form init == fresh path start; derive from Cv so the loop
    # carry is 'varying' under shard_map (see _ring_path)
    anchor = Cv[0, 0, 0].astype(jnp.int32) * 0
    init = (jnp.zeros((K, N, D), jnp.int32) + anchor,
            jnp.zeros((T, N, D), jnp.int16) + anchor.astype(jnp.int16))
    _, out = lax.fori_loop(0, n, body, init)
    return out


def _sgbm_strip_exact_fused(left_loc, right_loc, cfg: Config, n_real: int,
                            interp: bool):
    """Exact-ring strip body on the fused kernel path: cost kernel on a
    census-margin extended strip -> ring-tiled vertical sweeps -> strip-
    local transposed fwd sweep -> fused bwd sweep + WTA + d_R (fattened
    grid steps, see kernels.sgm_pallas). Identical math to
    `_aggregate_tiled_exact` + `wta`/`lr_check` (integer stages bit-exact;
    float subpixel to fp tolerance)."""
    from tpustereo.kernels import (census_cost_volume_pallas,
                                   dr_consistency_pallas)
    from tpustereo.kernels.sgm_pallas import (_p2_stack, _round_up,
                                              sgm_sweep, sweep_bwd_wta)
    from tpustereo.ops.sgm import p2_map

    ry = cfg.census_window[0] // 2
    Hs = left_loc.shape[0]
    ext_l = halo_exchange(left_loc, ry)
    ext_r = halo_exchange(right_loc, ry)
    C = census_cost_volume_pallas(ext_l, ext_r, cfg.num_disparities,
                                  cfg.max_census_cost, cfg.census_window,
                                  interpret=interp,
                                  d_start=cfg.min_disparity)
    C_loc = _zero_oob_rows(C[ry:C.shape[0] - ry], 0, Hs, n_real)
    _, W, D = C_loc.shape
    Dp = _round_up(D, 128)
    Wq = _round_up(W, 128)
    Cv = jnp.pad(C_loc, ((0, 0), (0, Wq - W), (0, Dp - D)))

    down = [(1, 0), (1, 1), (1, -1)] if cfg.paths == 8 else [(1, 0)]
    up = [(-1, 0), (-1, 1), (-1, -1)] if cfg.paths == 8 else [(-1, 0)]
    dxs_v = tuple(dx for _, dx in down)

    def p2_ext(dirs):
        # adaptive-P2 maps from the census-extended image so boundary rows
        # see the true neighbour gradient (as _aggregate_tiled_exact)
        if not cfg.adaptive_p2:
            return None
        maps = [p2_map(ext_l, dy, dx, cfg)[ry:ry + Hs] for dy, dx in dirs]
        st = jnp.stack(maps, axis=-1).astype(jnp.int32)
        return jnp.pad(st, ((0, 0), (0, Wq - W), (0, 0)))

    S = _ring_sweep_pallas(Cv, dxs_v, False, cfg, W, D, p2_ext(down), interp)
    S = S + _ring_sweep_pallas(Cv, dxs_v, True, cfg, W, D, p2_ext(up), interp)

    # horizontal paths are strip-local: transposed fwd sweep, then the
    # fused bwd sweep + WTA (as sgm_select_pallas)
    from tpustereo.kernels.transpose_pallas import transpose_hw_pallas
    Ct = transpose_hw_pallas(Cv, interpret=interp, trim=False)
    St = transpose_hw_pallas(S, interpret=interp, trim=False)
    Tt, H8 = Ct.shape[0], Ct.shape[1]
    St = sgm_sweep(Ct, St, (0,), False, p1=cfg.p1, p2=cfg.p2, n_real=Hs,
                   d_real=D, interpret=interp, c_max=cfg.max_census_cost,
                   p2_maps=_p2_stack(left_loc, [(0, 1)], cfg, True, Tt, H8))
    p2b = _p2_stack(left_loc, [(0, -1)], cfg, True, Tt, H8)
    disp, valid, d_r = sweep_bwd_wta(Ct, St, cfg, w_real=W, d_real=D,
                                     p2_maps=p2b, interpret=interp,
                                     d_start=cfg.min_disparity)
    disp = disp[:Hs, :W]
    valid = valid[:Hs, :W].astype(bool)
    d_r = d_r[:Hs, :W]
    if cfg.disp12_max_diff >= 0:
        valid &= dr_consistency_pallas(d_r, disp, cfg.num_disparities,
                                       cfg.disp12_max_diff, interpret=interp,
                                       d_start=cfg.min_disparity)
    return disp, valid, _strip_hits(d_r, cfg)


def _strip_hits(d_r, cfg: Config):
    """Strip-local `ops.postproc.lr_hits` for fill_mode='hirschmuller', or
    None. LR machinery is row-wise (hits[y] depends only on d_R[y]), so
    strip-local hits over exact-ring d_R equal the untiled map exactly.

    d_r arrives in the fused kernels' INDEX convention (d_r[x] =
    j_R(right col x - min_disparity), see sweep_bwd_wta): in that frame
    the hit test is ∃j: |d_r[x-j] - j| <= diff with lookups at cols
    < min_disparity failing — i.e. lr_hits at min_disparity=0 over the
    masked map, exactly equal to the true-unit formula."""
    if cfg.fill_mode != "hirschmuller":
        return None
    from tpustereo.ops import lr_hits
    if cfg.min_disparity:
        col = jnp.arange(d_r.shape[1], dtype=jnp.int32)[None, :]
        d_r = jnp.where(col < cfg.min_disparity, _BIG, d_r)
        return lr_hits(d_r, cfg.replace(min_disparity=0))
    return lr_hits(d_r, cfg)


def _sgbm_strip(left_loc, right_loc, cfg: Config, n_real: int):
    """Full pipeline body inside shard_map: local volume + WTA/LR, then
    global (all_gathered) speckle + median — postproc is bit-exact with
    the untiled pipeline. Bottom padding rows (global row >= n_real) are
    excluded from postproc and emitted as INVALID."""
    from tpustereo.utils.backend import pallas_mode
    mode = pallas_mode(cfg)
    fused_ok = (cfg.mode == "sgm" and mode != "off"
                and cfg.census_bits <= 64 and cfg.num_disparities <= 512
                and cfg.paths * (cfg.max_census_cost + cfg.p2) < 4096)
    if fused_ok and cfg.exact_tiling:
        disp, valid, hits = _sgbm_strip_exact_fused(
            left_loc, right_loc, cfg, n_real, interp=(mode == "interpret"))
    elif fused_ok:
        disp, valid, hits = _sgbm_strip_fused(left_loc, right_loc, cfg,
                                              n_real,
                                              interp=(mode == "interpret"))
    elif (cfg.mode == "census_wta" and mode != "off"
          and cfg.census_bits <= 64 and cfg.num_disparities <= 512
          and cfg.fill_mode != "hirschmuller"):
        # census+WTA is fully row-local past the census margin, so the
        # strip body is the untiled fused path on a ry-extended strip —
        # TPU-first like the untiled config 2 (no jnp cost volume)
        from tpustereo.kernels import census_cost_volume_pallas, wta_lr_pallas
        interp = mode == "interpret"
        ry = cfg.census_window[0] // 2
        ext_l = halo_exchange(left_loc, ry)
        ext_r = halo_exchange(right_loc, ry)
        He, W = ext_l.shape
        C = census_cost_volume_pallas(ext_l, ext_r, cfg.num_disparities,
                                      cfg.max_census_cost,
                                      cfg.census_window, interpret=interp,
                                      padded=True,
                                      d_start=cfg.min_disparity)
        disp_e, valid_e = wta_lr_pallas(C, cfg, interpret=interp,
                                        dims=(He, W, cfg.num_disparities))
        disp, valid = disp_e[ry:He - ry], valid_e[ry:He - ry]
        hits = None
    else:
        if cfg.mode != "sad":  # jnp SAD volume is verified on-chip (r31)
            from tpustereo.utils.backend import guard_tpu_fallback
            guard_tpu_fallback(cfg, "tiled volume/wta")
        S = _volume_local(left_loc, right_loc, cfg, n_real)
        if (mode != "off" and cfg.num_disparities <= 512
                and (cfg.mode != "sad" or cfg.sad_block <= 11)
                and cfg.fill_mode != "hirschmuller"):
            # selection rides the fused WTA/LR kernel (as the untiled
            # _select_and_refine) — the r31-verified config-1 composition
            from tpustereo.kernels import wta_lr_pallas
            disp, valid = wta_lr_pallas(S, cfg,
                                        interpret=(mode == "interpret"))
            hits = None
        else:
            if cfg.mode == "sad":
                from tpustereo.utils.backend import guard_tpu_fallback
                guard_tpu_fallback(cfg, "tiled sad wta/lr_check")
            disp, d_int, valid = wta(S, cfg)
            valid &= lr_check(S, disp, cfg)
            if cfg.fill_mode == "hirschmuller":
                from tpustereo.ops import lr_hits_from_volume
                hits = lr_hits_from_volume(S, cfg)
            else:
                hits = None

    full_disp = lax.all_gather(disp, AXIS, tiled=True)
    full_valid = lax.all_gather(valid, AXIS, tiled=True)
    full_hits = (lax.all_gather(hits, AXIS, tiled=True)
                 if hits is not None else None)
    from tpustereo.pipeline.sgbm import _postproc
    H_pad = full_disp.shape[0]
    if n_real < H_pad:
        # speckle/median must see exactly the real image (a padded row would
        # shift median's edge replication and could touch component sizes)
        out = _postproc(full_disp[:n_real], full_valid[:n_real], cfg,
                        hits=(None if full_hits is None
                              else full_hits[:n_real]))
        out = jnp.concatenate(
            [out, jnp.full((H_pad - n_real, out.shape[1]), INVALID,
                           out.dtype)], axis=0)
    else:
        out = _postproc(full_disp, full_valid, cfg, hits=full_hits)
    i = lax.axis_index(AXIS)
    Hs = disp.shape[0]
    return lax.dynamic_slice_in_dim(out, i * Hs, Hs, axis=0)


def _pad_rows(x: jnp.ndarray, strips: int) -> jnp.ndarray:
    """Pad the row axis (last-but-one) to a multiple of strips*8 with edge
    replication, so real rows near the bottom see exactly the untiled census
    border convention; the padded rows' costs are zeroed in-strip (an exact
    fresh path start, see _zero_oob_rows). The *8 makes every strip height a
    sublane multiple, which keeps every per-strip volume slab tile-aligned
    for the fattened sweep kernels with no per-strip row re-pad — global
    bottom padding is exact, mid-ring padding would not be."""
    H = x.shape[-2]
    Hp = -(-H // (strips * 8)) * (strips * 8)
    if Hp == H:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, Hp - H)
    return jnp.pad(x, pad, mode="edge")


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def sgbm_tiled(left, right, cfg: Config, mesh: Mesh):
    """Strip-tiled single-pair pipeline: rows sharded over 'strip'.

    Any H: rows are padded to a multiple of the strip count (the padding is
    exact — zero-cost rows are fresh path starts, and postproc runs on the
    real rows only). Returns (H, W) float32.
    """
    H = left.shape[0]
    strips = mesh.shape[AXIS]
    fn = shard_map(partial(_sgbm_strip, cfg=cfg, n_real=H), mesh=mesh,
                   in_specs=(P(AXIS, None), P(AXIS, None)),
                   out_specs=P(AXIS, None), check_vma=False)
    return fn(_pad_rows(left, strips), _pad_rows(right, strips))[:H]


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def sgbm_tiled_batched(left, right, cfg: Config, mesh: Mesh):
    """Batched + tiled: (B, H, W) sharded P('data', 'strip', None) —
    the config-4/5 production layout (SURVEY.md §4.2/§4.3). Any H (see
    sgbm_tiled)."""
    H = left.shape[1]
    strips = mesh.shape[AXIS]
    body = jax.vmap(partial(_sgbm_strip, cfg=cfg, n_real=H))
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P("data", AXIS, None), P("data", AXIS, None)),
                   out_specs=P("data", AXIS, None), check_vma=False)
    return fn(_pad_rows(left, strips), _pad_rows(right, strips))[:, :H]
