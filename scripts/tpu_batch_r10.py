"""Round-2 TPU batch #10: native (math.ctpop) popcount in the cost kernel.

Mosaic lowers lax.population_count to math.ctpop; if the VPU executes that
natively it replaces the 12-op SWAR fold — ~40% of the cost kernel's
per-element work (cost is 3.8 ms of the 16.5 ms b4 frame). Interpret mode
is exact for both (verified on CPU); this batch decides on-chip exactness
and speed. Process-global POPCOUNT_IMPL is set to "native" BEFORE anything
traces, so every program in this process uses it; the swar numbers for
comparison are batch #8/#9's.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r10_results.json"
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

    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))
    rec("popcount_impl", cost_pallas.POPCOUNT_IMPL)

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm

    kitti = PRESETS["kitti_sgm8"]

    # ---- 1. on-chip exactness: full pipeline, native popcount ------------
    L, R, _, _ = synthetic_pair((375, 1242), disparity=40.0, slope=0.02,
                                seed=0)
    L, R = jnp.asarray(L), jnp.asarray(R)
    out_pal = np.asarray(sgbm(L, R, kitti))
    out_jnp = np.asarray(sgbm(L, R, kitti.replace(backend="jnp")))
    diff = np.abs(out_pal - out_jnp)
    rec("exact/kitti_sgm8_nativepop", {
        "max_abs": float(diff.max()),
        "n_mismatch_1e5": int((diff > 1e-5).sum()),
        "n_px": int(diff.size),
    })
    # 9x7 census exercises the two-plane popcount path
    c97 = kitti.replace(census_window=(9, 7))
    out_pal = np.asarray(sgbm(L, R, c97))
    out_jnp = np.asarray(sgbm(L, R, c97.replace(backend="jnp")))
    diff = np.abs(out_pal - out_jnp)
    rec("exact/kitti_sgm8_9x7_nativepop", {
        "max_abs": float(diff.max()),
        "n_mismatch_1e5": int((diff > 1e-5).sum()),
        "n_px": int(diff.size),
    })

    if (results["exact/kitti_sgm8_nativepop"]["n_mismatch_1e5"]
            or results["exact/kitti_sgm8_9x7_nativepop"]["n_mismatch_1e5"]):
        rec("verdict", "NATIVE POPCOUNT WRONG ON CHIP — keep swar")
        return 0

    # ---- 2. cost-kernel micro: native vs swar in one process ------------
    # (standalone micros carry ~2-3 ms harness tax; it cancels in the
    # difference since both sides pay it)
    from tpustereo.kernels import census_cost_volume_pallas
    for impl in ("native", "swar"):
        cost_pallas.POPCOUNT_IMPL = impl
        jax.clear_caches()  # cfg-keyed jit caches would mask the switch
        ms = _timed_device_loop(
            lambda l: census_cost_volume_pallas(l, R, 128, 24, padded=True),
            L, iters=20) * 1e3
        rec(f"micro/cost_kernel_{impl}_ms", round(ms, 3))

    # ---- 3. headline bench with native popcount --------------------------
    cost_pallas.POPCOUNT_IMPL = "native"
    jax.clear_caches()
    r = run_benchmark(kitti, shape=(375, 1242), batch=4, iters=20)
    rec("bench/kitti_sgm8_b4_nativepop",
        {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(750, 1500),
                      batch=2, iters=5)
    rec("bench/middlebury_half_750x1500_nativepop",
        {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
