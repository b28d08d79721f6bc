"""Round-2 TPU batch #17: fused transposed-S emission + bitonic speckle.

Changes since r16 (proven exact in interpret mode; full CPU suite green):
  * the up sweep emits the horizontal-sweep S layout directly via the
    rank-4 block trick — the standalone St tile-transpose is gone from the
    fused pipeline (r16 attribution: sgm_select block is the frame);
  * component_big rides an in-VMEM bitonic sort kernel (two lax.sorts per
    frame were the expensive half of speckle, and lax.sort measured flat
    ~2.4-2.7 ms at every shape — r16 sort calibration).
Order: exactness gates first (interpret mode cannot catch Mosaic bugs),
then the headline, then micros, then regressions on the other presets,
then true-Middlebury half/full-res (VERDICT r1 #7).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r17_results.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def exact(key, a, b, tol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    bad = int((np.abs(a - b) > tol).sum())
    rec(key, {"max_abs": float(np.abs(a - b).max()),
              "n_mismatch": bad, "n_px": int(a.size)})
    return bad == 0


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"  # r10/r13: exact on chip
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    kitti = PRESETS["kitti_sgm8"]
    jcfg = kitti.replace(backend="jnp")

    # ---- 1. exactness: small pallas-vs-jnp (fast compile, full path mix:
    #         emit_transposed + bitonic both active at this size) ----------
    L, R, _, _ = synthetic_pair((120, 320), disparity=20.0, slope=0.05,
                                seed=1)
    L, R = jnp.asarray(L), jnp.asarray(R)
    ok = exact("exact/small_pallas_vs_jnp", sgbm(L, R, kitti),
               sgbm(L, R, jcfg))
    if not ok:
        rec("verdict", "SMALL PALLAS != JNP — STOP")
        return 0

    # ---- 2. exactness at KITTI size: singles + F4 stack ------------------
    F = 4
    pairs = [synthetic_pair((375, 1242), disparity=30.0 + 10 * f, slope=0.02,
                            seed=f) for f in range(F)]
    Ls = jnp.asarray(np.stack([p[0] for p in pairs]))
    Rs = jnp.asarray(np.stack([p[1] for p in pairs]))
    singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], kitti))
                        for f in range(F)])
    ok = exact("exact/kitti_single_vs_jnp", singles[0],
               sgbm(Ls[0], Rs[0], jcfg))
    kf = kitti.replace(frames_per_step=F)
    ok &= exact("exact/kitti_F4_vs_singles", sgbm_frames(Ls, Rs, kf),
                singles)
    if not ok:
        rec("verdict", "KITTI EXACTNESS FAILED — STOP")
        return 0

    # ---- 3. headline ------------------------------------------------------
    for batch in (16, 8):
        r = run_benchmark(kf, shape=(375, 1242), batch=batch, iters=20)
        rec(f"bench/kitti_sgm8_F4_b{batch}",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})

    # ---- 4. micros: the two new kernels ----------------------------------
    from tpustereo.kernels import (bitonic_sort_pallas,
                                   census_cost_volume_pallas,
                                   sgm_select_pallas)

    H, W = 375, 1242
    n = H * W
    rng = np.random.default_rng(0)
    lab = jnp.asarray(rng.integers(0, n, (n,), dtype=np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    ms = _timed_device_loop(
        lambda f: bitonic_sort_pallas(f, idx)[0].sum(), lab, iters=20) * 1e3
    rec("micro/bitonic_pair_465k_ms", round(ms, 3))
    ms = _timed_device_loop(
        lambda f: bitonic_sort_pallas(f).sum(), lab, iters=20) * 1e3
    rec("micro/bitonic_keys_465k_ms", round(ms, 3))
    ms = _timed_device_loop(
        lambda f: jax.lax.sort((f, idx), num_keys=1)[0].sum(), lab,
        iters=20) * 1e3
    rec("micro/laxsort_pair_465k_ms", round(ms, 3))

    C, Ct = census_cost_volume_pallas(Ls[0], Rs[0], 128, 24, (5, 5),
                                      padded=True, with_transposed=True)

    def select(c):
        d, v, dr = sgm_select_pallas(c, kitti, Ls[0], dims=(H, W, 128),
                                     Ct=Ct)
        return d.sum() + dr.sum()

    ms = _timed_device_loop(select, C, iters=10) * 1e3
    rec("micro/sgm_select_fusedSt_ms", round(ms, 3))  # r16: 14.365

    # ---- 5. other presets: regressions -----------------------------------
    r = run_benchmark(PRESETS["middlebury_sgm4"].replace(frames_per_step=F),
                      shape=(375, 1242), batch=8, iters=20)
    rec("bench/middlebury_sgm4_F4_b8",
        {k: r[k] for k in ("value", "ms_per_frame")})

    # ---- 6. true Middlebury half-res: exactness + bench ------------------
    cfg_h = PRESETS["middlebury_sgm4"]
    Lh, Rh, _, _ = synthetic_pair((750, 1500), disparity=60.0, slope=0.03,
                                  seed=9)
    Lh, Rh = jnp.asarray(Lh), jnp.asarray(Rh)
    ok = exact("exact/middlebury_half_vs_jnp", sgbm(Lh, Rh, cfg_h),
               sgbm(Lh, Rh, cfg_h.replace(backend="jnp")))
    r = run_benchmark(cfg_h, shape=(750, 1500), batch=4, iters=10)
    rec("bench/middlebury_half_750x1500",
        {k: r[k] for k in ("value", "ms_per_frame")})  # r13: 37.9 ms

    # ---- 7. true Middlebury FULL-res (VERDICT r1 #7): exact + bench ------
    try:
        Lf, Rf, _, _ = synthetic_pair((1500, 3000), disparity=100.0,
                                      slope=0.03, seed=10)
        Lf, Rf = jnp.asarray(Lf), jnp.asarray(Rf)
        exact("exact/middlebury_full_vs_jnp", sgbm(Lf, Rf, cfg_h),
              sgbm(Lf, Rf, cfg_h.replace(backend="jnp")))
        r = run_benchmark(cfg_h, shape=(1500, 3000), batch=2, iters=5)
        rec("bench/middlebury_full_1500x3000",
            {k: r[k] for k in ("value", "ms_per_frame")})
    except Exception as e:  # noqa: BLE001 — record, don't kill the batch
        rec("bench/middlebury_full_1500x3000", {"error": repr(e)[:300]})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
