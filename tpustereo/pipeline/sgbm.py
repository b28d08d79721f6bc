"""End-to-end stereo pipelines: one pure function per mode, everything under
a single `jax.jit` region (SURVEY.md §4.1). `cfg` is static (hashable frozen
dataclass) so each operating point compiles once.

Stage sequencing mirrors `golden.sgbm_numpy` exactly:
cost -> aggregate -> WTA(+uniqueness+subpixel) -> LR check -> speckle ->
invalidate -> median3. Invalid disparity = -1.0 (float32 output).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpustereo.config import Config
from tpustereo.ops import (aggregate, census, cost_volume, lr_check, median3,
                           sad_volume, speckle, wta)

INVALID = -1.0  # plain float: module import must not initialise the backend


from tpustereo.utils.backend import (  # noqa: E402
    guard_tpu_fallback as _guard_fallback, pallas_mode as _pallas_mode)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _bwd_feasible(H: int, F: int, cfg: Config) -> bool:
    """VMEM gate for the fused bwd+WTA kernel: its sublane axis is the
    (frame-stacked) padded image height. The F=8 KITTI stack measured
    23.87 MB scoped VMEM on chip (over the 16 MB limit) — oversize stacks
    fall back to the scan-of-singles path instead of failing to compile."""
    from tpustereo.kernels import bwd_wta_feasible
    Dp = (cfg.num_disparities + 127) // 128 * 128
    return bwd_wta_feasible((H + 7) // 8 * 8 * F, Dp)


def sgbm_volume(left: jnp.ndarray, right: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """The aggregated cost volume S for (left, right); (H, W, D) int16/int32."""
    if cfg.mode == "sad":
        return sad_volume(left, right, cfg.num_disparities, cfg.sad_block,
                          d_start=cfg.min_disparity)
    mode = _pallas_mode(cfg)
    interp = mode == "interpret"
    if (mode != "off" and cfg.census_bits <= 64
            and cfg.num_disparities <= 512):
        from tpustereo.kernels import census_cost_volume_pallas
        C = census_cost_volume_pallas(left, right, cfg.num_disparities,
                                      cfg.max_census_cost, cfg.census_window,
                                      interpret=interp,
                                      d_start=cfg.min_disparity)
    else:
        _guard_fallback(cfg, "census/cost_volume")
        cl = census(left, cfg.census_window)
        cr = census(right, cfg.census_window)
        C = cost_volume(cl, cr, cfg.num_disparities, cfg.max_census_cost,
                        d_start=cfg.min_disparity)
    if cfg.mode == "census_wta":
        return C.astype(jnp.int16)
    if mode != "off":
        from tpustereo.kernels import aggregate_pallas
        return aggregate_pallas(C, cfg, left, interpret=interp)
    _guard_fallback(cfg, "aggregate")
    return aggregate(C, cfg, left)


def _select_and_refine(S: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    mode = _pallas_mode(cfg)
    # SAD volumes can exceed int16 at large blocks; the kernel packs *256,
    # so D <= 512 keeps the lane field exact (min_disparity rides the
    # kernel's constant shear rolls)
    if (mode != "off" and cfg.num_disparities <= 512
            and (cfg.mode != "sad" or cfg.sad_block <= 11)):
        from tpustereo.kernels import wta_lr_pallas
        disp, valid = wta_lr_pallas(S, cfg, interpret=(mode == "interpret"))
    else:
        _guard_fallback(cfg, "wta/lr_check")
        disp, d_int, valid = wta(S, cfg)
        valid &= lr_check(S, disp, cfg)
    hits = None
    if cfg.fill_mode == "hirschmuller":
        from tpustereo.ops import lr_hits_from_volume
        hits = lr_hits_from_volume(S, cfg)
    return _postproc(disp, valid, cfg, hits=hits)


def _postproc_frames(disp, valid, cfg: Config, hits=None, interp=False):
    """(F, H, W) postproc: speckle with one cross-frame sort set
    (`ops.speckle_frames`), per-frame fills, one batched median launch.
    Bit-exact vs F runs of `_postproc`."""
    from tpustereo.ops import speckle_frames
    F = disp.shape[0]
    valid = speckle_frames(disp, valid, cfg)
    outs = []
    for f in range(F):
        d = jnp.where(valid[f], disp[f], INVALID)
        if cfg.fill_mode == "background":
            from tpustereo.ops import fill_background
            d = fill_background(d)
        elif cfg.fill_mode == "hirschmuller":
            from tpustereo.ops import fill_hirschmuller
            d = fill_hirschmuller(d, hits[f])
        outs.append(d)
    out = jnp.stack(outs)
    if cfg.median_filter:
        from tpustereo.kernels import median3_pallas
        out = median3_pallas(out, interpret=interp)
    return out


def _postproc(disp, valid, cfg: Config, hits=None):
    valid = speckle(disp, valid, cfg)
    disp = jnp.where(valid, disp, INVALID)
    if cfg.fill_mode == "background":
        from tpustereo.ops import fill_background
        disp = fill_background(disp)
    elif cfg.fill_mode == "hirschmuller":
        # hits (the epipolar-intersection map, ops.postproc.lr_hits) comes
        # from whichever path computed d_R; classification: hit ⇒ mismatch,
        # no hit ⇒ occlusion (golden.sgbm_numpy stage 'lr_hits')
        from tpustereo.ops import fill_hirschmuller
        disp = fill_hirschmuller(disp, hits)
    if cfg.median_filter:
        mode = _pallas_mode(cfg)
        if mode != "off":
            from tpustereo.kernels import median3_pallas
            disp = median3_pallas(disp, interpret=(mode == "interpret"))
        else:
            disp = median3(disp)
    return disp


def _sad_fused_ok(H: int, W: int, cfg: Config) -> bool:
    """Dispatch gate for the fused plane-sweep SAD kernel: block <= 11
    keeps S < 2^15 (the o2/smsp field packing), hirschmuller fill needs
    the volume (lr_hits) the fused path never materialises, and the VMEM/
    lane-roll feasibility mirrors the kernel's slab arithmetic."""
    from tpustereo.kernels import sad_fused_feasible
    return (cfg.mode == "sad" and cfg.sad_block <= 11
            and cfg.fill_mode != "hirschmuller"
            and sad_fused_feasible(H, W, cfg.num_disparities, cfg.sad_block,
                                   cfg.disp12_max_diff >= 0))


@partial(jax.jit, static_argnames="cfg")
def sgbm(left: jnp.ndarray, right: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Single-pair pipeline: (H, W) uint8 ×2 -> (H, W) float32 disparity."""
    mode = _pallas_mode(cfg)
    if mode != "off" and _sad_fused_ok(*left.shape, cfg):
        # fused plane-sweep SAD + WTA: the cost volume never reaches HBM
        # (kernels/sad_pallas.py — VERDICT r4 next #1)
        from tpustereo.kernels import dr_consistency_pallas, sad_wta_pallas
        interp = mode == "interpret"
        disp, valid, d_rs = sad_wta_pallas(left, right, cfg,
                                           interpret=interp)
        if cfg.disp12_max_diff >= 0:
            valid &= dr_consistency_pallas(d_rs, disp, cfg.num_disparities,
                                           cfg.disp12_max_diff,
                                           interpret=interp,
                                           d_start=cfg.min_disparity)
        return _postproc(disp, valid, cfg)
    if (cfg.mode == "census_wta" and mode != "off" and cfg.census_bits <= 64
            and cfg.num_disparities <= 512
            and cfg.fill_mode != "hirschmuller"):
        # (hirschmuller fill needs d_R / the hits map, which this fused
        # path never materialises — that rare combination takes the
        # volume path below where S is available)
        # fused census_wta path: the WTA kernel reads the padded uint8 cost
        # frame directly — the slice + int16 cast + re-pad it replaces were
        # three full-volume relayout passes (dominant at Middlebury size)
        from tpustereo.kernels import census_cost_volume_pallas, wta_lr_pallas
        interp = mode == "interpret"
        H, W = left.shape
        C = census_cost_volume_pallas(left, right, cfg.num_disparities,
                                      cfg.max_census_cost, cfg.census_window,
                                      interpret=interp, padded=True,
                                      d_start=cfg.min_disparity)
        disp, valid = wta_lr_pallas(C, cfg, interpret=interp,
                                    dims=(H, W, cfg.num_disparities))
        return _postproc(disp, valid, cfg)
    # kernel preconditions: census fits two uint32 planes; the packed-argmin
    # and log-shear tricks assume D <= 512 lanes (the WTA pack shift
    # widens with D); the 12-bit parabola-delta packing assumes S_max =
    # paths*(C_max+P2) < 4096. min_disparity rides the cost kernel's
    # constant shear roll — the sweeps/WTA are disparity-index based.
    if (cfg.mode == "sgm" and mode != "off" and cfg.census_bits <= 64
            and cfg.num_disparities <= 512
            and cfg.paths * (cfg.max_census_cost + cfg.p2) < 4096
            and _bwd_feasible(left.shape[-2], 1, cfg)):
        # fully fused kernel path: cost -> sweeps -> WTA without the
        # completed S volume ever round-tripping HBM; the cost kernel emits
        # the sweep-ready padded frame (padded=True) so the volume is never
        # sliced/re-padded either
        from tpustereo.kernels import (census_cost_volume_pallas,
                                       dr_consistency_pallas,
                                       sgm_select_pallas)
        interp = mode == "interpret"
        H, W = left.shape
        # fused transposed emission only for single-plane censuses: with
        # two bitplanes (census_bits > 32) the extra double-buffered Ct
        # block pushed the cost kernel 952K over the 16M scoped-VMEM limit
        # on chip (r10 batch) — those configs keep the standalone transpose.
        # Width gate: the kernel's in-kernel i32 shear/broadcast temps
        # scale with R*Wq*D — Wq=1536 fits (ran exact, r21), Wq=3072 OOMs
        # scoped VMEM (true-Middlebury full-res, r2-probe) — so wide
        # volumes also keep the standalone transpose.
        fuse_ct = cfg.census_bits <= 32 and _round_up(W, 128) <= 1536
        with jax.named_scope("cost_volume"):
            res = census_cost_volume_pallas(
                left, right, cfg.num_disparities, cfg.max_census_cost,
                cfg.census_window, interpret=interp, padded=True,
                with_transposed=fuse_ct, d_start=cfg.min_disparity)
            C, Ct = res if fuse_ct else (res, None)
        with jax.named_scope("sgm_select"):
            disp, valid, d_r = sgm_select_pallas(
                C, cfg, left, interpret=interp,
                dims=(H, W, cfg.num_disparities), Ct=Ct)
        with jax.named_scope("postproc"):
            hits = None
            if cfg.disp12_max_diff >= 0:
                if cfg.fill_mode == "hirschmuller":
                    ok, hits = dr_consistency_pallas(
                        d_r, disp, cfg.num_disparities, cfg.disp12_max_diff,
                        interpret=interp, with_hits=True,
                        d_start=cfg.min_disparity)
                else:
                    ok = dr_consistency_pallas(d_r, disp,
                                               cfg.num_disparities,
                                               cfg.disp12_max_diff,
                                               interpret=interp,
                                               d_start=cfg.min_disparity)
                valid &= ok
            return _postproc(disp, valid, cfg, hits=hits)
    with jax.named_scope("sgbm_volume"):
        S = sgbm_volume(left, right, cfg)
    with jax.named_scope("select_refine"):
        return _select_and_refine(S, cfg)


@partial(jax.jit, static_argnames="cfg")
def sgbm_frames(left: jnp.ndarray, right: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Frame-stacked pipeline: (F, H, W) uint8 ×2 -> (F, H, W) float32.

    All F frames ride ONE set of cost/sweep/WTA kernel launches, stacked on
    the vertical scan axis (the sweep kernels re-zero carries at frame
    seams; in the horizontal layout frames occupy disjoint sublanes, which
    is the actual win — see `sgm_select_pallas`). The LR-consistency kernel
    is row-independent, so it takes the frames as one stacked map; speckle
    and median run per frame (component isolation / edge replication are
    per-frame semantics). Bit-exact vs F runs of `sgbm`.

    Falls back to a `lax.scan` of singles when the fused-kernel
    preconditions don't hold.
    """
    F, H, W = left.shape
    mode = _pallas_mode(cfg)
    if F > 1 and mode != "off" and _sad_fused_ok(H, W, cfg):
        # stacked plane-sweep SAD: F frames = F grid segments of one
        # launch (carries re-init per frame; zero cross-frame interaction)
        from tpustereo.kernels import dr_consistency_pallas, sad_wta_pallas
        interp = mode == "interpret"
        disp, valid, d_rs = sad_wta_pallas(left, right, cfg,
                                           interpret=interp)
        if cfg.disp12_max_diff >= 0:
            ok = dr_consistency_pallas(d_rs.reshape(F * H, W),
                                       disp.reshape(F * H, W),
                                       cfg.num_disparities,
                                       cfg.disp12_max_diff,
                                       interpret=interp,
                                       d_start=cfg.min_disparity)
            valid &= ok.reshape(F, H, W)
        return _postproc_frames(disp, valid, cfg, interp=interp)
    if (F > 1 and cfg.mode == "census_wta" and mode != "off"
            and cfg.census_bits <= 64 and cfg.num_disparities <= 512
            and cfg.fill_mode != "hirschmuller"):
        # stacked analog of sgbm's fused census_wta path: the WTA kernel is
        # row-local, so F frames ride one cost + one WTA launch set
        from tpustereo.kernels import census_cost_volume_pallas, wta_lr_pallas
        interp = mode == "interpret"
        C = census_cost_volume_pallas(left, right, cfg.num_disparities,
                                      cfg.max_census_cost, cfg.census_window,
                                      interpret=interp, padded=True,
                                      d_start=cfg.min_disparity)
        disp, valid = wta_lr_pallas(C, cfg, interpret=interp,
                                    dims=(H, W, cfg.num_disparities),
                                    frames=F)
        return _postproc_frames(disp, valid, cfg, interp=interp)
    if (F > 1 and cfg.mode == "sgm" and mode != "off"
            and cfg.census_bits <= 64 and cfg.num_disparities <= 512
            and cfg.paths * (cfg.max_census_cost + cfg.p2) < 4096
            and _bwd_feasible(H, F, cfg)):
        from tpustereo.kernels import (census_cost_volume_pallas,
                                       dr_consistency_pallas,
                                       sgm_select_pallas)
        interp = mode == "interpret"
        D = cfg.num_disparities
        fuse_ct = (cfg.census_bits <= 32
                   and _round_up(W, 128) <= 1536)  # see sgbm: VMEM gates
        with jax.named_scope("cost_volume"):
            res = census_cost_volume_pallas(
                left, right, D, cfg.max_census_cost, cfg.census_window,
                interpret=interp, padded=True, with_transposed=fuse_ct,
                d_start=cfg.min_disparity)
            C, Ct = res if fuse_ct else (res, None)
        with jax.named_scope("sgm_select"):
            disp, valid, d_r = sgm_select_pallas(
                C, cfg, left, interpret=interp, dims=(H, W, D), Ct=Ct,
                frames=F)
        with jax.named_scope("postproc"):
            hits = None
            if cfg.disp12_max_diff >= 0:
                flat = lambda a: a.reshape(F * H, W)  # noqa: E731
                if cfg.fill_mode == "hirschmuller":
                    ok, hits = dr_consistency_pallas(
                        flat(d_r), flat(disp), D, cfg.disp12_max_diff,
                        interpret=interp, with_hits=True,
                        d_start=cfg.min_disparity)
                    hits = hits.reshape(F, H, W)
                else:
                    ok = dr_consistency_pallas(flat(d_r), flat(disp), D,
                                               cfg.disp12_max_diff,
                                               interpret=interp,
                                               d_start=cfg.min_disparity)
                valid &= ok.reshape(F, H, W)
            return _postproc_frames(disp, valid, cfg, hits=hits,
                                    interp=interp)

    def one(carry, lr):
        l, r = lr
        return carry, sgbm.__wrapped__(l, r, cfg)

    _, out = jax.lax.scan(one, jnp.int32(0), (left, right))
    return out


@partial(jax.jit, static_argnames="cfg")
def sgbm_batched(left: jnp.ndarray, right: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Batched pipeline: (B, H, W) uint8 ×2 -> (B, H, W) float32.

    `lax.scan` over the batch, NOT vmap: one chip runs pairs sequentially
    at full single-pair speed (vmapping the Pallas pipeline measured a
    ~25% per-frame tax even at B=1), and cross-chip batch parallelism
    happens by sharding the batch axis over the mesh 'data' axis before
    this function runs per-shard (SURVEY.md §4.2). When
    cfg.frames_per_step divides the batch, each scan step processes that
    many frames through one set of kernel launches (`sgbm_frames`)."""
    B, H, W = left.shape
    F = cfg.frames_per_step
    if F > 1 and B % F == 0:
        def chunk(carry, lr):
            l, r = lr
            return carry, sgbm_frames.__wrapped__(l, r, cfg)

        shp = (B // F, F, H, W)
        _, out = jax.lax.scan(chunk, jnp.int32(0),
                              (left.reshape(shp), right.reshape(shp)))
        return out.reshape(B, H, W)

    def one(carry, lr):
        l, r = lr
        return carry, sgbm.__wrapped__(l, r, cfg)

    _, out = jax.lax.scan(one, jnp.int32(0), (left, right))
    return out
