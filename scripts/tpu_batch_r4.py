"""Round-2 TPU batch #4: post-optimisation re-bench + postproc A/Bs.

After batch #3: micros carry ~2-3 ms of harness tax at KITTI size, so every
decision here uses in-context deltas (config variants of the full fused
pipeline). New since #3: single-tree subpixel extraction in the bwd kernel,
precomputed out-of-search mask in the cost kernel.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r4_results.json"
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
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
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

    kitti = PRESETS["kitti_sgm8"]

    # ---- 1. re-validate + headline bench ---------------------------------
    exactness("kitti_sgm8", kitti, (375, 1242))
    r = run_benchmark(kitti, shape=(375, 1242), batch=2, iters=10)
    rec("bench/kitti_sgm8", {k: r[k] for k in
                             ("value", "ms_per_frame", "vs_baseline")})
    r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(375, 1242), batch=2,
                      iters=10)
    rec("bench/middlebury_sgm4", {k: r[k] for k in ("value", "ms_per_frame")})

    # ---- 2. in-context config A/Bs at KITTI size -------------------------
    from tpustereo.kernels import census_cost_volume_pallas
    from tpustereo.kernels.sgm_pallas import sgm_select_pallas
    from tpustereo.ops.postproc import dr_consistency
    from tpustereo.pipeline.sgbm import _postproc

    def decomp(tag, shape, cfg):
        H, W = shape
        L8, R8, _, _ = synthetic_pair(shape, disparity=40.0, slope=0.02, seed=0)
        L8, R8 = jnp.asarray(L8), jnp.asarray(R8)
        D = cfg.num_disparities

        def p_cost(l, r):
            return census_cost_volume_pallas(l, r, D, cfg.max_census_cost,
                                             cfg.census_window, padded=True)

        def p_select(l, r):
            C = p_cost(l, r)
            return sgm_select_pallas(C, cfg, l, dims=(H, W, D))[0]

        def p_full(l, r):
            return sgbm.__wrapped__(l, r, cfg)

        def p_full_jnp_dr(l, r):
            C = p_cost(l, r)
            disp, valid, d_r = sgm_select_pallas(C, cfg, l, dims=(H, W, D))
            if cfg.disp12_max_diff >= 0:
                valid &= dr_consistency(d_r, disp, D, cfg.disp12_max_diff)
            return _postproc(disp, valid, cfg)

        for name, fn, it in [("cost", p_cost, 10), ("select", p_select, 10),
                             ("full", p_full, 10),
                             ("full_jnp_dr", p_full_jnp_dr, 10)]:
            ms = _timed_device_loop(fn, L8, R8, iters=it) * 1e3
            rec(f"decomp{tag}/{name}_ms", round(ms, 3))
        for name, c2 in [("full_noLR", cfg.replace(disp12_max_diff=-1)),
                         ("full_nospeckle", cfg.replace(speckle_window_size=0)),
                         ("full_nomedian", cfg.replace(median_filter=False))]:
            ms = _timed_device_loop(
                lambda l, r, c2=c2: sgbm.__wrapped__(l, r, c2),
                L8, R8, iters=10) * 1e3
            rec(f"decomp{tag}/{name}_ms", round(ms, 3))

    decomp("", (375, 1242), kitti)

    # ---- 3. Middlebury-half scaling sink ---------------------------------
    decomp("_mb", (750, 1500), PRESETS["middlebury_sgm4"])

    # ---- 4. pick up anything batch #3 missed -----------------------------
    prev = {}
    try:
        with open("scripts/tpu_r3_results.json") as f:
            prev = json.load(f)
    except Exception:
        pass
    if "bench/middlebury_full_1500x3000" not in prev:
        r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(1500, 3000),
                          batch=1, iters=3)
        rec("bench/middlebury_full_1500x3000",
            {k: r[k] for k in ("value", "ms_per_frame")})
    if "bench/census_wta_750x1500" not in prev:
        r = run_benchmark(PRESETS["middlebury_census_wta"], shape=(750, 1500),
                          batch=2, iters=5)
        rec("bench/census_wta_750x1500",
            {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
