"""Round-2 TPU batch #5: banded-CC Middlebury runs + final preset sweep.

Batch #4 landed kitti_sgm8 at 56.6 fps and showed the 750x1500 frame is
~60% jnp connected components (select 26.6 ms of a 70.8 ms frame); the
banded CC (VMEM-budget-fixed after the 25.2 MB OOM) replaces that. This
batch: Middlebury-geometry pipeline with banded CC, the full-res bench the
unrolled-jnp-CC program never finished compiling, and a final bench of all
presets at HEAD (including batch=1, the judged bench.py operating point).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r5_results.json"
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

    mb = PRESETS["middlebury_sgm4"]

    # ---- 1. Middlebury half-res with banded CC ---------------------------
    # exactness re-verified at this size (banded path now active on-chip)
    exactness("middlebury_sgm4_750x1500_banded", mb, (750, 1500),
              disparity=80.0)
    r = run_benchmark(mb, shape=(750, 1500), batch=2, iters=5)
    rec("bench/middlebury_half_750x1500", {k: r[k] for k in ("value", "ms_per_frame")})

    # ---- 2. full-res -----------------------------------------------------
    r = run_benchmark(mb, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_1500x3000", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(PRESETS["middlebury_census_wta"], shape=(750, 1500),
                      batch=2, iters=5)
    rec("bench/census_wta_750x1500", {k: r[k] for k in ("value", "ms_per_frame")})

    # ---- 3. final preset sweep at HEAD -----------------------------------
    kitti = PRESETS["kitti_sgm8"]
    for batch in (1, 2, 4):
        r = run_benchmark(kitti, shape=(375, 1242), batch=batch, iters=15)
        rec(f"bench/kitti_sgm8_b{batch}",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    r = run_benchmark(mb, shape=(375, 1242), batch=1, iters=15)
    rec("bench/middlebury_sgm4_b1", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(PRESETS["middlebury_census_wta"], shape=(375, 621),
                      batch=1, iters=15)
    rec("bench/census_wta_b1", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(PRESETS["tsukuba_sad"], shape=(288, 384), batch=1,
                      iters=15)
    rec("bench/tsukuba_sad_b1", {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
