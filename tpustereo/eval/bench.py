"""Benchmark harness (SURVEY.md §3 #20, §5.1, §5.5): warmup-compile, timed
loop with `block_until_ready` discipline, per-stage time table, structured
JSON run record (config, git sha, chip count, fps/chip, per-stage ms)."""

from __future__ import annotations

import dataclasses
import subprocess
import time
from typing import Dict, Optional, Tuple

import numpy as np

from tpustereo.config import Config

BASELINE_FPS = 2.72  # OpenCV StereoSGBM MODE_HH CPU proxy (BASELINE.md)


def _git_sha() -> str:
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True, timeout=5,
                              cwd=__file__.rsplit("/", 3)[0]).stdout.strip()
    except Exception:
        return "unknown"


def _timed_device_loop(fn, *args, iters: int = 20) -> float:
    """Seconds per call of fn(*args), amortised inside ONE XLA program so
    dispatch/tunnel latency cannot pollute the number. A per-iteration tweak
    of one input element creates a loop-carried dependency (defeats CSE)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(*a):
        first = a[0]

        def body(i, acc):
            flat = first.reshape(-1)
            tweaked = flat.at[0].set((i % 7).astype(flat.dtype)).reshape(first.shape)
            out = fn(tweaked, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(many(*args))  # compile + warmup
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / iters


def stage_times(left, right, cfg: Config, iters: int = 5) -> Dict[str, float]:
    """Per-stage milliseconds: each stage jitted separately so its cost is
    attributable (the full pipeline fuses them — the sum here is an upper
    bound on the fused time). SURVEY.md §5.1."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from tpustereo.ops import aggregate, census, cost_volume, lr_check, \
        median3, speckle, wta

    from tpustereo.pipeline.sgbm import _pallas_mode

    l8, r8 = jnp.asarray(left), jnp.asarray(right)
    ms: Dict[str, float] = {}
    n = iters

    mode = _pallas_mode(cfg)
    if cfg.mode == "sad":
        # SAD: profile whichever path the dispatcher runs (the fused
        # plane-sweep kernel, or the volume path off-gate)
        from tpustereo.pipeline.sgbm import _sad_fused_ok
        if mode != "off" and _sad_fused_ok(*l8.shape, cfg):
            from tpustereo.kernels import sad_wta_pallas
            ms["sad_fused(volume+wta)"] = _timed_device_loop(
                lambda l: sad_wta_pallas(l, r8, cfg,
                                         interpret=(mode == "interpret"))[0],
                l8, iters=n) * 1e3
        else:
            from tpustereo.ops import sad_volume, wta
            vol = partial(sad_volume, num_disp=cfg.num_disparities,
                          block=cfg.sad_block, d_start=cfg.min_disparity)
            S = jax.jit(vol)(l8, r8)
            ms["sad_volume"] = _timed_device_loop(vol, l8, r8, iters=n) * 1e3
            ms["wta_subpixel"] = _timed_device_loop(
                lambda s: wta(s, cfg)[0], S, iters=n) * 1e3
        from tpustereo.pipeline.sgbm import sgbm as _pipe
        disp = _pipe(l8, r8, cfg)
        valid = disp >= 0
        ms["speckle"] = _timed_device_loop(
            lambda d: speckle(d, valid, cfg), disp, iters=n) * 1e3
        if cfg.median_filter:
            ms["median3"] = _timed_device_loop(median3, disp, iters=n) * 1e3
        return {k: round(v, 3) for k, v in ms.items()}
    # same census gate as pipeline/sgbm.py so the profile measures the path
    # the production pipeline actually runs (<= 64 bits, two uint32 planes)
    if (mode != "off" and cfg.census_bits <= 64
            and cfg.num_disparities <= 512):
        from tpustereo.kernels import census_cost_volume_pallas
        fused_cost = partial(census_cost_volume_pallas,
                             num_disp=cfg.num_disparities,
                             max_cost=cfg.max_census_cost,
                             window=cfg.census_window,
                             d_start=cfg.min_disparity,
                             interpret=(mode == "interpret"))
        C = jax.jit(fused_cost)(l8, r8)
        ms["census+cost_volume(fused)"] = _timed_device_loop(
            fused_cost, l8, r8, iters=n) * 1e3
    else:
        ms["census"] = _timed_device_loop(
            partial(census, window=cfg.census_window), l8, iters=n) * 1e3 * 2
        cl, cr = census(l8, cfg.census_window), census(r8, cfg.census_window)
        vol = partial(cost_volume, num_disp=cfg.num_disparities,
                      max_cost=cfg.max_census_cost)
        C = jax.jit(vol)(cl, cr)
        ms["cost_volume"] = _timed_device_loop(vol, cl, cr, iters=n) * 1e3
    if mode != "off" and cfg.mode == "sgm":
        # profile the stages the fused pipeline actually runs
        from tpustereo.kernels import dr_consistency_pallas, sgm_select_pallas
        interp = mode == "interpret"
        sel = partial(sgm_select_pallas, cfg=cfg, img=l8, interpret=interp)
        disp, valid, d_r = jax.jit(sel)(C)
        ms["sgm_select(4 sweeps+wta fused)"] = _timed_device_loop(
            sel, C, iters=n) * 1e3
        if cfg.disp12_max_diff >= 0:
            ms["dr_consistency"] = _timed_device_loop(
                lambda dr: dr_consistency_pallas(dr, disp,
                                                 cfg.num_disparities,
                                                 cfg.disp12_max_diff,
                                                 interpret=interp,
                                                 d_start=cfg.min_disparity),
                d_r, iters=n) * 1e3
    else:
        agg = partial(aggregate, cfg=cfg, img=l8)
        S = jax.jit(agg)(C)
        ms["aggregate"] = _timed_device_loop(agg, C, iters=n) * 1e3
        disp, d_int, valid = jax.jit(partial(wta, cfg=cfg))(S)
        ms["wta_subpixel"] = _timed_device_loop(
            lambda s: wta(s, cfg)[0], S, iters=n) * 1e3
        ms["lr_check"] = _timed_device_loop(
            lambda s: lr_check(s, disp, cfg), S, iters=n) * 1e3

    ms["speckle"] = _timed_device_loop(
        lambda d: speckle(d, valid, cfg), disp, iters=n) * 1e3
    if mode != "off":  # the executed path's median is the Pallas kernel
        from tpustereo.kernels import median3_pallas
        ms["median3"] = _timed_device_loop(
            partial(median3_pallas, interpret=(mode == "interpret")),
            disp, iters=n) * 1e3
    else:
        ms["median3"] = _timed_device_loop(median3, disp, iters=n) * 1e3
    return {k: round(v, 3) for k, v in ms.items()}


def production_stage_times(cfg: Config, lefts, rights, iters: int = 10) -> Dict[str, float]:
    """In-context per-stage ms/frame of the EXECUTED production composition
    (the frames_per_step=F fused `sgbm_batched` pipeline) via pipeline
    differencing: time the full pipeline, then the same pipeline with one
    postproc stage disabled at a time, and attribute the difference — the
    r21/r22 methodology, now reproducible from `bench --stages` instead of
    bespoke batch scripts (VERDICT r2 weak #2). The 'core' row (cost + 4
    sweeps + fused WTA) is measured directly with all postproc off;
    'unattributed' is full − core − Σ(stages) and absorbs fusion overlap
    (can be slightly negative — stages XLA overlaps with the core)."""
    from tpustereo.pipeline import sgbm_batched

    batch = lefts.shape[0]

    def ms_for(c: Config) -> float:
        sec = _timed_device_loop(lambda l, r: sgbm_batched(l, r, c),
                                 lefts, rights, iters=iters)
        return sec / batch * 1e3

    full = ms_for(cfg)
    out: Dict[str, float] = {"full_pipeline": full}
    strip = {}
    if cfg.speckle_window_size > 0:
        out["speckle"] = full - ms_for(cfg.replace(speckle_window_size=0))
        strip["speckle_window_size"] = 0
    if cfg.median_filter:
        out["median3"] = full - ms_for(cfg.replace(median_filter=False))
        strip["median_filter"] = False
    if cfg.disp12_max_diff >= 0 and cfg.fill_mode != "hirschmuller":
        out["lr_check"] = full - ms_for(cfg.replace(disp12_max_diff=-1))
        strip["disp12_max_diff"] = -1
    if cfg.fill_mode != "off":
        out["fill"] = full - ms_for(cfg.replace(fill_mode="off"))
        strip["fill_mode"] = "off"
    core = ms_for(cfg.replace(**strip))
    out["core(cost+sweeps+wta)"] = core
    out["unattributed"] = full - core - sum(
        v for k, v in out.items() if k not in ("full_pipeline",
                                               "core(cost+sweeps+wta)"))
    return {k: round(v, 3) for k, v in out.items()}


def run_odometry_benchmark(cfg: Config, shape: Tuple[int, int] = (375, 1242),
                           frames: int = 4, iters: int = 10,
                           ocfg=None, stacked: bool = False,
                           tiled: bool = False, mesh=None) -> dict:
    """Throughput of the fused odometry tracking step (SURVEY.md §4.4;
    VERDICT r2 #1 'a measured frames/s for the odometry loop').

    Times the DEVICE-side per-frame work — the full fused program (SGM
    pipeline + corners + descriptors + keyframe matching + GN pose) scanned
    over `frames` stacked pairs against a fixed keyframe, inside one XLA
    program (`_timed_device_loop` discipline: the tunnelled dev chip's
    dispatch RTT must not pollute the number). Host-side keyframe/graph
    bookkeeping (microseconds of numpy) and the per-frame decision
    transfer are excluded: on the tunnel that transfer costs a 30-45 ms
    RTT that co-located hardware would not pay.

    Single-chip default: times `fused_track_step` (the untiled matcher),
    so cfg.strips is normalized to 1 and the record's config describes
    what was actually measured.

    tiled=True (VERDICT r3 weak #6): times the config-5 two-dispatch
    composition — the strip-tiled matcher (`sgbm_tiled` over the mesh)
    feeding `fused_track_from_disp` — inside one timed program, so the
    record is the DEVICE-side cost of the tiled tracking step (the
    2-dispatch property itself is pinned by
    tests/test_odometry_tiled.py::test_tracked_frame_dispatch_count).
    The mesh defaults to (data=1, strip=n_devices): real strips on
    multi-device hardware, strip=1 composition cost on the dev chip,
    fake 8-device mesh under the test env."""
    import jax
    import jax.numpy as jnp
    from tpustereo.data.synthetic import synthetic_sequence
    from tpustereo.odometry import OdometryConfig
    from tpustereo.odometry.backend import _DESC_DIM
    from tpustereo.odometry.fused import fused_track_step

    H, W = shape
    if tiled:
        from tpustereo.dist import make_mesh
        mesh = mesh or make_mesh(data=1, strip=len(jax.devices()))
        cfg = cfg.replace(strips=mesh.shape["strip"])
    else:
        cfg = cfg.replace(strips=1)
    ocfg = ocfg or OdometryConfig()
    calib, seq, _ = synthetic_sequence(
        n_frames=frames + 1, shape=shape, depth=12.0, fx=718.0,
        baseline=0.54, step_x=0.08, slant=0.35, seed=3)
    intr = jnp.asarray([calib.fx, calib.fy, calib.cx, calib.cy], jnp.float32)
    baseline = jnp.float32(calib.baseline)
    K = ocfg.max_corners
    zeros = (jnp.zeros((K, _DESC_DIM), jnp.float32), jnp.zeros((K,), bool),
             jnp.zeros((K, 3), jnp.float32))
    out0 = fused_track_step(jnp.asarray(seq[0][0]), jnp.asarray(seq[0][1]),
                            *zeros, intr, baseline, cfg, ocfg)
    kf = (out0.desc, out0.valid, out0.X)
    Ls = jnp.stack([jnp.asarray(L) for L, _ in seq[1:]])
    Rs = jnp.stack([jnp.asarray(R) for _, R in seq[1:]])

    # the checksum folds EVERY TrackOut field into the returned scalar: a
    # tracked frame's pose does not depend on its own disparity (GN uses
    # the KEYFRAME's 3D points), so returning poses alone lets XLA
    # dead-code-eliminate the whole SGM pipeline from the timed program
    # (caught live: 2.0 ms/frame for the 'full' odometry step)
    def _chk(o):
        return (o.disp.sum() + o.X.sum() + o.T.sum() + o.residual
                + o.valid.sum() + o.n_matches + o.pts.sum()
                + o.desc.sum()).astype(jnp.float32)

    if stacked:
        from tpustereo.odometry.fused import fused_track_frames

        def track_many(ls, rs, kf_desc, kf_valid, kf_X):
            return _chk(fused_track_frames.__wrapped__(
                ls, rs, kf_desc, kf_valid, kf_X, intr, baseline, cfg, ocfg))
    elif tiled:
        from tpustereo.dist.tiling import sgbm_tiled
        from tpustereo.odometry.fused import fused_track_from_disp

        def track_many(ls, rs, kf_desc, kf_valid, kf_X):
            def body(c, lr):
                disp = sgbm_tiled.__wrapped__(lr[0], lr[1], cfg, mesh)
                o = fused_track_from_disp.__wrapped__(
                    lr[0], disp, kf_desc, kf_valid, kf_X, intr, baseline,
                    cfg, ocfg)
                return c + _chk(o), o.n_matches

            c, _ = jax.lax.scan(body, jnp.float32(0), (ls, rs))
            return c
    else:
        def track_many(ls, rs, kf_desc, kf_valid, kf_X):
            def body(c, lr):
                o = fused_track_step.__wrapped__(
                    lr[0], lr[1], kf_desc, kf_valid, kf_X, intr, baseline,
                    cfg, ocfg)
                return c + _chk(o), o.n_matches

            c, _ = jax.lax.scan(body, jnp.float32(0), (ls, rs))
            return c

    sec = _timed_device_loop(track_many, Ls, Rs, *kf, iters=iters) / frames
    return {
        "metric": (f"odometry fused-"
                   f"{'chunk' if stacked else 'tiled' if tiled else 'step'}"
                   f" fps/chip ({H}x{W}, D={cfg.num_disparities}, "
                   f"{cfg.paths}-path"
                   + (f", strips={cfg.strips}" if tiled else "") + ")"),
        "value": round(1.0 / sec, 3),
        "unit": "fps/chip",
        "ms_per_frame": round(sec * 1e3, 3),
        "stacked": stacked,
        "tiled": tiled,
        "frames_per_step": frames,
        "max_corners": K,
        "device_kind": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "git_sha": _git_sha(),
        "config": dataclasses.asdict(cfg),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }


def run_benchmark(cfg: Config, shape: Tuple[int, int] = (375, 1242),
                  batch: int = 2, iters: int = 10, stages: bool = False,
                  tiled: bool = False, mesh: Optional[object] = None,
                  profile_dir: Optional[str] = None) -> dict:
    """One benchmark run -> structured record (SURVEY.md §5.5).

    profile_dir: write a jax.profiler trace (Perfetto/XPlane) of the timed
    loop there (SURVEY.md §5.1)."""
    import contextlib
    import jax
    import jax.numpy as jnp
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline import sgbm_batched

    H, W = shape
    L, R, _, _ = synthetic_pair((H, W), disparity=40.0, slope=0.02, seed=0)
    lefts = jnp.asarray(np.stack([L] * batch))
    rights = jnp.asarray(np.stack([R] * batch))

    trace = (jax.profiler.trace(profile_dir) if profile_dir
             else contextlib.nullcontext())
    n_devices = len(jax.devices())
    if tiled:
        from tpustereo.dist import make_mesh, sgbm_tiled_batched
        mesh = mesh or make_mesh(data=1, strip=n_devices)
        strip = mesh.shape["strip"]
        cfg = cfg.replace(strips=strip, batch_size=batch)
        with trace:
            sec = _timed_device_loop(
                lambda l, r: sgbm_tiled_batched(l, r, cfg, mesh),
                lefts, rights, iters=iters)
        chips = mesh.size
    else:
        cfg = cfg.replace(batch_size=batch)
        with trace:
            sec = _timed_device_loop(
                lambda l, r: sgbm_batched(l, r, cfg), lefts, rights,
                iters=iters)
        chips = 1

    fps = batch / sec
    kind = {"sad": f"SAD block-{cfg.sad_block}",
            "census_wta": "census+WTA"}.get(cfg.mode,
                                            f"SGM {cfg.paths}-path")
    record = {
        "metric": f"{kind} fps/chip ({H}x{W}, D={cfg.num_disparities})",
        "value": round(fps / chips, 3),
        "unit": "fps/chip",
        "vs_baseline": round(fps / chips / BASELINE_FPS, 2),
        "fps_total": round(fps, 3),
        "ms_per_frame": round(sec / batch * 1e3, 3),
        "batch": batch,
        "chips": chips,
        "n_devices": n_devices,
        "device_kind": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "tiled": tiled,
        "git_sha": _git_sha(),
        "config": dataclasses.asdict(cfg),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    if stages:
        if not tiled:
            # the production composition (frames_per_step fused batched
            # pipeline), decomposed in context by differencing — the
            # methodology is mode-generic (r5: SAD/census_wta too, so
            # `bench --preset tsukuba_sad --stages` works)
            record["stage_ms"] = production_stage_times(cfg, lefts, rights,
                                                        iters=iters)
        else:
            record["stage_ms"] = stage_times(L, R, cfg)
    # analytic ops/bytes roofline: names the bounding resource for this
    # measurement (SURVEY.md §6; free — no extra device work). Single-chip
    # runs only: the model's per-frame ops/bytes against ONE chip's peaks
    # would overstate a tiled run's utilization by ~the strip count.
    if not tiled:
        from tpustereo.eval.roofline import roofline
        core_ms = (record.get("stage_ms") or {}).get("core(cost+sweeps+wta)")
        rl = roofline(cfg, shape, sec / batch,
                      device_kind=record["device_kind"],
                      core_sec_per_frame=(core_ms / 1e3 if core_ms else None))
        if rl is not None:
            record["roofline"] = rl
    if profile_dir:
        from tpustereo.eval.roofline import device_busy_fraction
        busy = device_busy_fraction(profile_dir)
        if busy:
            record["device_busy_fraction"] = busy
    return record
