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


def _time_fn(fn, iters: int) -> float:
    """Seconds per call, warmup excluded, device-synchronised."""
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
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

    l8, r8 = jnp.asarray(left), jnp.asarray(right)
    ms: Dict[str, float] = {}

    cen = jax.jit(partial(census, window=cfg.census_window))
    cl = cen(l8)
    ms["census"] = _time_fn(lambda: cen(l8), iters) * 1e3 * 2  # both images
    cr = cen(r8)

    vol = jax.jit(partial(cost_volume, num_disp=cfg.num_disparities,
                          max_cost=cfg.max_census_cost))
    C = vol(cl, cr)
    ms["cost_volume"] = _time_fn(lambda: vol(cl, cr), iters) * 1e3

    agg = jax.jit(partial(aggregate, cfg=cfg))
    S = agg(C, img=l8)
    ms["aggregate"] = _time_fn(lambda: agg(C, img=l8), iters) * 1e3

    wta_j = jax.jit(partial(wta, cfg=cfg))
    disp, d_int, valid = wta_j(S)
    ms["wta_subpixel"] = _time_fn(lambda: wta_j(S), iters) * 1e3

    lr = jax.jit(partial(lr_check, cfg=cfg))
    ms["lr_check"] = _time_fn(lambda: lr(S, disp), iters) * 1e3

    spk = jax.jit(partial(speckle, cfg=cfg))
    ms["speckle"] = _time_fn(lambda: spk(disp, valid), iters) * 1e3

    med = jax.jit(median3)
    ms["median3"] = _time_fn(lambda: med(disp), iters) * 1e3
    return {k: round(v, 3) for k, v in ms.items()}


def run_benchmark(cfg: Config, shape: Tuple[int, int] = (375, 1242),
                  batch: int = 2, iters: int = 10, stages: bool = False,
                  tiled: bool = False,
                  mesh: Optional[object] = None) -> dict:
    """One benchmark run -> structured record (SURVEY.md §5.5)."""
    import jax
    import jax.numpy as jnp
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline import sgbm_batched

    H, W = shape
    L, R, _, _ = synthetic_pair((H, W), disparity=40.0, slope=0.02, seed=0)
    lefts = jnp.asarray(np.stack([L] * batch))
    rights = jnp.asarray(np.stack([R] * batch))

    n_devices = len(jax.devices())
    if tiled:
        from tpustereo.dist import make_mesh, sgbm_tiled_batched
        mesh = mesh or make_mesh(data=1, strip=n_devices)
        strip = mesh.shape["strip"]
        cfg = cfg.replace(strips=strip, batch_size=batch)
        sec = _time_fn(lambda: sgbm_tiled_batched(lefts, rights, cfg, mesh), iters)
        chips = mesh.size
    else:
        cfg = cfg.replace(batch_size=batch)
        sec = _time_fn(lambda: sgbm_batched(lefts, rights, cfg), iters)
        chips = 1

    fps = batch / sec
    record = {
        "metric": f"SGM {cfg.paths}-path fps/chip ({H}x{W}, D={cfg.num_disparities})",
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
        record["stage_ms"] = stage_times(L, R, cfg)
    return record
