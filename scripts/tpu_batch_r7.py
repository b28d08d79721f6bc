"""Round-2 TPU batch #7: final preset sweep + large-size postproc attribution.

The 1500x3000 full pipeline never finished AOT-compiling on the tunnel
(>75 min, twice). Here: the remaining preset benches from batch #5, the
postproc A/Bs + sort micros from the batch #6 plan, and stripped full-res
variants to (a) isolate which stage explodes the full-res compile and
(b) get at least the compute-path number at that geometry.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r7_results.json"
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

    # ---- 1. final preset sweep (batch=1 = the judged bench.py point) -----
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
    r = run_benchmark(PRESETS["middlebury_census_wta"], shape=(750, 1500),
                      batch=2, iters=5)
    rec("bench/census_wta_750x1500", {k: r[k] for k in ("value", "ms_per_frame")})

    # ---- 2. postproc attribution at 750x1500 -----------------------------
    H, W = 750, 1500
    L8, R8, _, _ = synthetic_pair((H, W), disparity=80.0, slope=0.02, seed=0)
    L8, R8 = jnp.asarray(L8), jnp.asarray(R8)
    for name, c2 in [("full", mb),
                     ("full_noLR", mb.replace(disp12_max_diff=-1)),
                     ("full_nospeckle", mb.replace(speckle_window_size=0)),
                     ("full_nomedian", mb.replace(median_filter=False))]:
        ms = _timed_device_loop(
            lambda l, r, c2=c2: sgbm.__wrapped__(l, r, c2),
            L8, R8, iters=5) * 1e3
        rec(f"mb/{name}_ms", round(ms, 3))

    # ---- 3. sort / speckle micros at 1.15M -------------------------------
    rng = np.random.default_rng(0)
    n = H * W
    keys = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    ms = _timed_device_loop(lambda k: jax.lax.sort(k), keys, iters=10) * 1e3
    rec("micro/sort1_1.15M_ms", round(ms, 3))
    ms = _timed_device_loop(
        lambda k: jax.lax.sort((k, idx), num_keys=1)[0], keys,
        iters=10) * 1e3
    rec("micro/sort2_1.15M_ms", round(ms, 3))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    bits = jnp.asarray(rng.integers(0, 2, n, dtype=np.int32))
    ms = _timed_device_loop(
        lambda p: jnp.zeros(n, jnp.int32).at[p].set(
            bits, unique_indices=True, mode="drop"),
        perm, iters=10) * 1e3
    rec("micro/scatter_set_1.15M_ms", round(ms, 3))

    from tpustereo.ops.postproc import component_big
    from tpustereo.kernels.cc_pallas import connected_component_labels_pallas
    v = rng.random((H, W)) < 0.7
    conn_h = jnp.asarray(v[:, :-1] & v[:, 1:])
    conn_v = jnp.asarray(v[:-1, :] & v[1:, :])
    ms = _timed_device_loop(
        lambda ch: connected_component_labels_pallas(ch, conn_v),
        conn_h, iters=5) * 1e3
    rec("micro/cc_banded_750x1500_ms", round(ms, 3))
    lab = connected_component_labels_pallas(conn_h, conn_v)
    ms = _timed_device_loop(
        lambda l: component_big(l, 100), lab, iters=5) * 1e3
    rec("micro/component_big_750x1500_ms", round(ms, 3))

    # ---- 4. full-res compile isolation -----------------------------------
    # bare compute path (no LR, no speckle, no median): does THIS compile?
    bare = mb.replace(disp12_max_diff=-1, speckle_window_size=0,
                      median_filter=False)
    r = run_benchmark(bare, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_BARE_1500x3000",
        {k: r[k] for k in ("value", "ms_per_frame")})
    # + LR only
    lr_only = mb.replace(speckle_window_size=0, median_filter=False)
    r = run_benchmark(lr_only, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_LR_1500x3000",
        {k: r[k] for k in ("value", "ms_per_frame")})
    # full pipeline last (known compile risk)
    r = run_benchmark(mb, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_1500x3000",
        {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
