"""Round-2 batched TPU job: every on-chip check/bench in ONE process.

The dev chip is tunnelled (axon): dispatch RTT 30-45 ms and every new XLA
program compiles server-side in 5-30 min, so all TPU work is batched here
and run ONCE in the background (CLAUDE.md). Results stream to stdout as
JSON lines and accumulate in scripts/tpu_r2_results.json.

Order = priority: the headline exactness gate and bench first, so a partial
run still yields the numbers that matter.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r2_results.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark, stage_times
    from tpustereo.pipeline.sgbm import sgbm

    def exactness(tag, cfg, shape, disparity=40.0):
        L, R, _, _ = synthetic_pair(shape, disparity=disparity, slope=0.02, seed=0)
        L, R = jnp.asarray(L), jnp.asarray(R)
        out_pal = np.asarray(sgbm(L, R, cfg))
        out_jnp = np.asarray(sgbm(L, R, cfg.replace(backend="jnp")))
        diff = np.abs(out_pal - out_jnp)
        rec(f"exact/{tag}", {
            "max_abs": float(diff.max()),
            "n_mismatch_1e5": int((diff > 1e-5).sum()),
            "n_px": int(diff.size),
        })

    # ---- 1. headline exactness gate: kitti_sgm8 compiled vs jnp ----------
    kitti = PRESETS["kitti_sgm8"]
    exactness("kitti_sgm8_375x1242", kitti, (375, 1242))

    # ---- 2. headline bench ------------------------------------------------
    r = run_benchmark(kitti, shape=(375, 1242), batch=2, iters=10)
    rec("bench/kitti_sgm8", {k: r[k] for k in
                             ("value", "ms_per_frame", "vs_baseline")})

    # ---- 3. fattened-step sweep microbench --------------------------------
    # Quantifies the per-grid-step fixed cost amortisation (R rows/step).
    from tpustereo.kernels.sgm_pallas import sgm_sweep, _round_up
    from tpustereo.kernels.transpose_pallas import transpose_hw_pallas
    H, W, D = 375, 1242, 128
    Hp, Wq = _round_up(H, 8), _round_up(W, 128)
    rng = np.random.default_rng(0)
    Cv = jnp.asarray(rng.integers(0, 24, (Hp, Wq, D), dtype=np.uint8))
    Sv = jnp.asarray(rng.integers(0, 2000, (Hp, Wq, D), dtype=np.int16))

    for r in (1, 4, 8):
        def vsweep(c, s, r=r):
            return sgm_sweep(c, s, (0, 1, -1), False, p1=10, p2=120,
                             n_real=W, d_real=D, rows_per_step=r)
        ms = _timed_device_loop(vsweep, Cv, Sv, iters=10) * 1e3
        rec(f"micro/v_sweep3_R{r}_ms", round(ms, 3))
    ms = _timed_device_loop(
        lambda c: transpose_hw_pallas(c, trim=False), Sv, iters=10) * 1e3
    rec("micro/transpose_int16_ms", round(ms, 3))

    # ---- 4. per-stage profile --------------------------------------------
    L, R, _, _ = synthetic_pair((375, 1242), disparity=40.0, slope=0.02, seed=0)
    rec("stages/kitti_sgm8", stage_times(L, R, kitti, iters=5))

    # ---- 5. other presets: exactness + bench ------------------------------
    exactness("middlebury_sgm4_375x1242", PRESETS["middlebury_sgm4"], (375, 1242))
    r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(375, 1242), batch=2, iters=10)
    rec("bench/middlebury_sgm4", {k: r[k] for k in ("value", "ms_per_frame")})

    exactness("census_wta_375x621", PRESETS["middlebury_census_wta"], (375, 621))
    r = run_benchmark(PRESETS["middlebury_census_wta"], shape=(375, 621), batch=2, iters=10)
    rec("bench/census_wta", {k: r[k] for k in ("value", "ms_per_frame")})

    exactness("tsukuba_sad_288x384", PRESETS["tsukuba_sad"], (288, 384), disparity=12.0)
    r = run_benchmark(PRESETS["tsukuba_sad"], shape=(288, 384), batch=2, iters=10)
    rec("bench/tsukuba_sad", {k: r[k] for k in ("value", "ms_per_frame")})

    k97 = kitti.replace(census_window=(9, 7))
    exactness("kitti_sgm8_9x7", k97, (375, 1242))
    r = run_benchmark(k97, shape=(375, 1242), batch=2, iters=10)
    rec("bench/kitti_sgm8_9x7", {k: r[k] for k in ("value", "ms_per_frame")})

    kap2 = kitti.replace(adaptive_p2=True)
    exactness("kitti_sgm8_adaptive_p2", kap2, (375, 1242))

    # ---- 6. true Middlebury geometry (VERDICT #7) -------------------------
    # half-res ~750x1500 and full-res ~1500x3000; parity at half-res, bench
    # at both (full-res jnp fallback would add an hour of compile for no new
    # information).
    mb = PRESETS["middlebury_sgm4"]
    exactness("middlebury_sgm4_750x1500", mb, (750, 1500), disparity=80.0)
    r = run_benchmark(mb, shape=(750, 1500), batch=2, iters=5)
    rec("bench/middlebury_half_750x1500", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(mb, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_1500x3000", {k: r[k] for k in ("value", "ms_per_frame")})
    mb_wta = PRESETS["middlebury_census_wta"]
    r = run_benchmark(mb_wta, shape=(750, 1500), batch=2, iters=5)
    rec("bench/census_wta_750x1500", {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
