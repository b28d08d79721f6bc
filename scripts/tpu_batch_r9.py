"""Round-2 TPU batch #9: new LR-kernel validation + final preset table.

Batch #8 confirmed the all-Pallas banded CC bit-exact on-chip and took
750x1500 from 61.1 to 37.4 ms/frame. Since then the LR-check kernel was
rewritten (incremental roll + single final compare, 64-row blocks) and
optional background gap-filling was added. This batch: on-chip exactness
of both (every sgm program recompiles for the LR kernel anyway), the dr
micro with the new kernel, and the full preset sweep at HEAD that becomes
the BASELINE.md round-2 final table. census_wta/sad presets contain
neither changed kernel, so their programs ride the server-side cache.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r9_results.json"
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

    kitti = PRESETS["kitti_sgm8"]
    mb = PRESETS["middlebury_sgm4"]

    def exactness(tag, cfg, shape, disparity=40.0):
        L, R, _, _ = synthetic_pair(shape, disparity=disparity, slope=0.02,
                                    seed=0)
        L, R = jnp.asarray(L), jnp.asarray(R)
        out_pal = np.asarray(sgbm(L, R, cfg))
        out_jnp = np.asarray(sgbm(L, R, cfg.replace(backend="jnp")))
        diff = np.abs(out_pal - out_jnp)
        rec(f"exact/{tag}", {
            "max_abs": float(diff.max()),
            "n_mismatch_1e5": int((diff > 1e-5).sum()),
            "n_px": int(diff.size),
        })

    # ---- 1. exactness: new LR kernel + gap filling -----------------------
    exactness("kitti_sgm8", kitti, (375, 1242))
    exactness("kitti_sgm8_fill", kitti.replace(fill_mode="background"),
              (375, 1242))

    # ---- 2. dr micro with the new kernel ---------------------------------
    from tpustereo.kernels import dr_consistency_pallas
    rng = np.random.default_rng(0)
    for (h, w) in [(375, 1242), (750, 1500)]:
        d_r = jnp.asarray(rng.integers(0, 128, (h, w), dtype=np.int32))
        dl = jnp.asarray(rng.uniform(0, 127, (h, w)).astype(np.float32))
        ms = _timed_device_loop(
            lambda a, dl=dl: dr_consistency_pallas(a, dl, 128, 1), d_r,
            iters=10) * 1e3
        rec(f"micro/dr_consistency_{h}x{w}_ms", round(ms, 3))

    # ---- 3. final preset table at HEAD -----------------------------------
    for batch in (1, 2, 4, 8):
        r = run_benchmark(kitti, shape=(375, 1242), batch=batch, iters=20)
        rec(f"bench/kitti_sgm8_b{batch}",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    r = run_benchmark(mb, shape=(375, 1242), batch=1, iters=15)
    rec("bench/middlebury_sgm4_b1", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(mb, shape=(750, 1500), batch=2, iters=5)
    rec("bench/middlebury_half_750x1500",
        {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(PRESETS["middlebury_census_wta"], shape=(375, 621),
                      batch=1, iters=15)
    rec("bench/census_wta_b1", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(PRESETS["middlebury_census_wta"], shape=(750, 1500),
                      batch=2, iters=5)
    rec("bench/census_wta_750x1500",
        {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(PRESETS["tsukuba_sad"], shape=(288, 384), batch=1,
                      iters=15)
    rec("bench/tsukuba_sad_b1", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(kitti.replace(census_window=(9, 7)),
                      shape=(375, 1242), batch=1, iters=15)
    rec("bench/kitti_sgm8_census9x7_b1",
        {k: r[k] for k in ("value", "ms_per_frame")})

    # LAST on purpose: this exact program (full pipeline incl. banded CC +
    # median at 1500x3000) hung batch #8's server-side compile for 100+ min;
    # everything above must land even if it hangs again.
    r = run_benchmark(mb, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_1500x3000",
        {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
