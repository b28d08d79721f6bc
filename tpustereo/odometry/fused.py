"""Fused on-device odometry tracking step (SURVEY.md §4.4; VERDICT r2
next-round #1).

One jitted XLA program per tracked frame: disparity (full SGM pipeline) +
Harris corners + patch descriptors + keyframe matching (MXU matmul) +
backprojection + Huber-GN pose — the host only receives the tiny
(T, residual, n_matches) triple for the keyframe decision and graph
bookkeeping. The round-2 `StereoOdometry.step` made 5+ separate device
calls with host syncs between; on the tunnelled dev chip every call pays a
30-45 ms RTT, so the loop ran at ~1-2 s/frame — this restructure makes a
tracked frame exactly ONE dispatch (two in strip-tiled mode: the tiled
matcher runs under its own shard_map program, then `fused_track_from_disp`
consumes the disparity without it ever visiting the host).

Bit-identical math to the unfused path: the same `pipeline.sgbm`,
`features.*`, and `pnp.gauss_newton_pose` functions are traced into one
program; `backproject` mirrors `StereoOdometry._backproject` (numpy) op
for op (round -> clip -> lookup -> f·B/d ray).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpustereo.config import Config
from tpustereo.odometry.features import (describe, detect_corners,
                                         match_descriptors)
from tpustereo.odometry.pnp import gauss_newton_pose


class TrackOut(NamedTuple):
    """Everything a frame step can need — host code transfers only the
    small leaves (T, residual, n_matches) unless it makes a keyframe."""
    disp: jnp.ndarray    # (H, W) float32
    pts: jnp.ndarray     # (K, 2) float32 [y, x], subpixel
    desc: jnp.ndarray    # (K, P) float32
    valid: jnp.ndarray   # (K,) bool: corner valid & depth valid (keyframe-ready)
    X: jnp.ndarray       # (K, 3) float32 camera-frame 3D points
    T: jnp.ndarray       # (4, 4) float32 keyframe cam -> current cam
    residual: jnp.ndarray  # () float32 mean weighted reprojection residual
    n_matches: jnp.ndarray  # () int32 weighted match count


def backproject(pts: jnp.ndarray, disp: jnp.ndarray, intr: jnp.ndarray,
                baseline: jnp.ndarray, min_depth: float, max_depth: float):
    """jnp mirror of `StereoOdometry._backproject`: 3D points at (subpixel)
    corner positions; the disparity lookup rounds, the ray uses the
    subpixel position."""
    fx, fy, cx, cy = intr
    H, W = disp.shape
    pi = jnp.round(pts).astype(jnp.int32)
    py = jnp.clip(pi[:, 0], 0, H - 1)
    px = jnp.clip(pi[:, 1], 0, W - 1)
    d = disp[py, px]
    z = jnp.where(d > 0, fx * baseline / jnp.maximum(d, 1e-6), 0.0)
    ok = (z > min_depth) & (z < max_depth)
    x = (pts[:, 1] - cx) * z / fx
    y = (pts[:, 0] - cy) * z / fy
    return jnp.stack([x, y, z], -1).astype(jnp.float32), ok


def _track_core(left, disp, kf_desc, kf_valid, kf_X, intr, baseline,
                cfg: Config, ocfg) -> TrackOut:
    pts, cvalid = detect_corners(left, max_corners=ocfg.max_corners)
    desc = describe(left, pts)
    X, ok = backproject(pts, disp, intr, baseline,
                        ocfg.min_depth, ocfg.max_depth)
    idx_b, good = match_descriptors(kf_desc, desc, kf_valid, cvalid,
                                    min_similarity=ocfg.min_similarity)
    w = (good & kf_valid).astype(jnp.float32)
    u = pts[idx_b][:, ::-1]  # (K, 2) [x, y] pixels
    T, res = gauss_newton_pose(kf_X, u, w, intr, iters=ocfg.gn_iters)
    return TrackOut(disp, pts, desc, cvalid & ok, X, T, res,
                    w.sum().astype(jnp.int32))


@partial(jax.jit, static_argnames=("cfg", "ocfg"))
def fused_track_step(left, right, kf_desc, kf_valid, kf_X, intr, baseline,
                     cfg: Config, ocfg) -> TrackOut:
    """ONE device program: sgbm + features + matching + GN pose. On the
    first frame pass all-zero keyframe state: matching finds nothing
    (kf_valid all False), GN holds T = I, and the caller consumes only the
    keyframe fields — same compiled program either way."""
    from tpustereo.pipeline.sgbm import sgbm
    disp = sgbm.__wrapped__(left, right, cfg)
    return _track_core(left, disp, kf_desc, kf_valid, kf_X, intr, baseline,
                       cfg, ocfg)


@partial(jax.jit, static_argnames=("cfg", "ocfg"))
def fused_track_from_disp(left, disp, kf_desc, kf_valid, kf_X, intr,
                          baseline, cfg: Config, ocfg) -> TrackOut:
    """Tracking for callers whose disparity comes from another program
    (the strip-tiled matcher, config 5): tiled mode is exactly TWO device
    dispatches per tracked frame."""
    return _track_core(left, disp, kf_desc, kf_valid, kf_X, intr, baseline,
                       cfg, ocfg)


@partial(jax.jit, static_argnames=("cfg", "ocfg"))
def fused_track_frames(lefts, rights, kf_desc, kf_valid, kf_X, intr,
                       baseline, cfg: Config, ocfg) -> TrackOut:
    """High-rate tracking: F frames through ONE program, all tracked
    against the SAME keyframe. Disparities ride the frame-stacked pipeline
    (`sgbm_frames` — the F-fold sublane-fattening win of the matcher
    benchmarks); features/matching/GN are frame-independent given a fixed
    keyframe, so they vmap. Semantics caveat vs the sequential `step`
    loop: keyframe decisions apply only at chunk boundaries, so a keyframe
    born mid-chunk does not retarget the chunk's remaining frames — the
    production pattern for sequences where keyframes change every >> F
    frames. Returns TrackOut with a leading (F,) axis."""
    from tpustereo.pipeline.sgbm import sgbm_frames
    disp = sgbm_frames.__wrapped__(lefts, rights, cfg)
    return jax.vmap(
        lambda l, d: _track_core(l, d, kf_desc, kf_valid, kf_X, intr,
                                 baseline, cfg, ocfg)
    )(lefts, disp)


@jax.jit
def batched_candidate_match(descs, valids, new_desc, new_valid,
                            min_similarity):
    """Loop-closure candidate matching for ALL stored keyframes in ONE
    program: vmapped mutual-NN NCC (a stack of MXU matmuls) + per-candidate
    weighted match counts. descs (E, K, P), valids (E, K) — padded rows are
    all-invalid and count 0. Returns (idx_bs (E, K), goods (E, K),
    counts (E,)). Replaces the per-candidate dispatch loop (up to
    lc_max_candidates tunnel RTTs per keyframe)."""
    idx_bs, goods = jax.vmap(
        lambda da, va: match_descriptors(da, new_desc, va, new_valid,
                                         min_similarity=min_similarity)
    )(descs, valids)
    counts = (goods & valids).sum(axis=1).astype(jnp.int32)
    return idx_bs, goods, counts
