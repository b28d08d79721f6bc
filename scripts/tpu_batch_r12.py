"""Round-2 TPU batch #12: final preset table at the winning configuration.

Reads r10/r11 results and applies their verdicts automatically:
  * native popcount (r10): only if exact on chip AND the cost micro was
    faster than swar;
  * frames_per_step (r11): the fastest F whose stacked output was exact.
Then re-verifies full-pipeline exactness at that combined configuration
(it is a NEW program — popcount x frames combinations were measured
separately) and produces the final preset sweep for BASELINE.md round 2.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r12_results.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def main():
    t_start = time.time()
    r10 = load("scripts/tpu_r10_results.json")
    r11 = load("scripts/tpu_r11_results.json")

    use_native = (
        r10.get("exact/kitti_sgm8_nativepop", {}).get("n_mismatch_1e5", 1) == 0
        and r10.get("exact/kitti_sgm8_9x7_nativepop", {}).get(
            "n_mismatch_1e5", 1) == 0
        and r10.get("micro/cost_kernel_native_ms", 1e9)
        < r10.get("micro/cost_kernel_swar_ms", 0))
    best_f, best_fps = 1, 0.0
    for F in (1, 2, 4):
        row = r11.get(f"bench/kitti_sgm8_b8_F{F}")
        if isinstance(row, dict) and row.get("value", 0) > best_fps:
            ok = (F == 1 or r11.get(f"exact/kitti_sgm8_frames{F}", {}).get(
                "n_mismatch_1e5", 1) == 0)
            if ok:
                best_f, best_fps = F, row["value"]
    rec("decisions", {"popcount": "native" if use_native else "swar",
                      "frames_per_step": best_f,
                      "f1_vs_best": best_fps})

    import jax
    import jax.numpy as jnp

    if use_native:
        import tpustereo.kernels.cost_pallas as cost_pallas
        cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    kitti = PRESETS["kitti_sgm8"].replace(frames_per_step=best_f)
    mb = PRESETS["middlebury_sgm4"]

    # ---- 1. exactness at the combined configuration ----------------------
    pairs = [synthetic_pair((375, 1242), disparity=30.0 + 10 * f, slope=0.02,
                            seed=f) for f in range(max(best_f, 1))]
    Ls = jnp.asarray(np.stack([p[0] for p in pairs]))
    Rs = jnp.asarray(np.stack([p[1] for p in pairs]))
    singles = np.stack([
        np.asarray(sgbm(Ls[f], Rs[f], kitti.replace(backend="jnp")))
        for f in range(max(best_f, 1))])
    if best_f > 1:
        out = np.asarray(sgbm_frames(Ls, Rs, kitti))
    else:
        out = np.asarray(sgbm(Ls[0], Rs[0], kitti))[None]
    n_bad = int((np.abs(out - singles) > 1e-5).sum())
    rec("exact/final_config", {
        "max_abs": float(np.abs(out - singles).max()),
        "n_mismatch_1e5": n_bad, "n_px": int(out.size)})
    if n_bad:
        rec("verdict", "COMBINED CONFIG INEXACT — keep preset defaults")
        return 0

    # ---- 2. final sweep --------------------------------------------------
    for batch in (8, 16):
        r = run_benchmark(kitti, shape=(375, 1242), batch=batch, iters=20)
        rec(f"bench/kitti_sgm8_b{batch}_final",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    r = run_benchmark(mb.replace(frames_per_step=best_f), shape=(375, 1242),
                      batch=8, iters=15)
    rec("bench/middlebury_sgm4_b8_final",
        {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(mb.replace(frames_per_step=min(best_f, 2)),
                      shape=(750, 1500), batch=2, iters=5)
    rec("bench/middlebury_half_750x1500_final",
        {k: r[k] for k in ("value", "ms_per_frame")})
    # configs 1-2 batched: their b1 numbers are dispatch-bound at tiny
    # geometry (SAD b1 ~183 fps vs the 208-fps CPU proxy); the batched
    # throughput is the honest serving comparison, same as config 4's
    # SAD volume was rewritten gather-free (log-shear + window sums):
    # exactness of the whole config-1 pipeline on chip, then b1/b8
    sad = PRESETS["tsukuba_sad"]
    Lt, Rt, _, _ = synthetic_pair((288, 384), disparity=20.0, slope=0.02,
                                  seed=3)
    Lt, Rt = jnp.asarray(Lt), jnp.asarray(Rt)
    d_pal = np.asarray(sgbm(Lt, Rt, sad))
    d_jnp = np.asarray(sgbm(Lt, Rt, sad.replace(backend="jnp")))
    rec("exact/tsukuba_sad_shear", {
        "max_abs": float(np.abs(d_pal - d_jnp).max()),
        "n_mismatch_1e5": int((np.abs(d_pal - d_jnp) > 1e-5).sum())})
    for batch in (1, 8):
        r = run_benchmark(sad, shape=(288, 384), batch=batch, iters=15)
        rec(f"bench/tsukuba_sad_b{batch}",
            {k: r[k] for k in ("value", "ms_per_frame")})
    cw = PRESETS["middlebury_census_wta"]
    if best_f > 1:
        # stacked census_wta exactness gate, then the batched number
        pairs = [synthetic_pair((375, 621), disparity=25.0 + 5 * f,
                                slope=0.02, seed=10 + f)
                 for f in range(best_f)]
        Lc = jnp.asarray(np.stack([p[0] for p in pairs]))
        Rc = jnp.asarray(np.stack([p[1] for p in pairs]))
        st = np.asarray(sgbm_frames(Lc, Rc, cw))
        si = np.stack([np.asarray(sgbm(Lc[f], Rc[f], cw))
                       for f in range(best_f)])
        n_bad = int((np.abs(st - si) > 1e-5).sum())
        rec("exact/census_wta_frames", {"n_mismatch_1e5": n_bad})
        if n_bad == 0:
            cw = cw.replace(frames_per_step=best_f)
    r = run_benchmark(cw, shape=(375, 621), batch=8, iters=15)
    rec("bench/census_wta_b8", {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
