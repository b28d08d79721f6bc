"""Round-2 TPU batch #17 (reordered): validate + measure the new kernels.

Changes since r16 (proven exact in interpret mode; full CPU suite green):
  * up sweep emits the horizontal-sweep S layout directly (rank-4 block
    trick) — the standalone St tile-transpose is gone from the fused
    pipeline (r16 attribution: the sgm_select block IS the frame);
  * component_big rides an in-VMEM bitonic sort kernel (lax.sort measured
    flat ~2.4-2.7 ms at every shape — r16 sort calibration).

Ordering lesson (first r17 attempt): the KITTI-size jnp-reference program
sat >58 min in the remote compiler with everything queued behind it. So:
pallas-only exactness (A/B against the external-transpose layout at full
geometry) and the headline run FIRST; the slow jnp-reference gates run
LAST and each one is try/except'd — if the compiler grinds overnight the
results file already has everything else.
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
    import tpustereo.kernels.sgm_pallas as sgm_pallas
    import tpustereo.kernels.bitonic_pallas as bitonic_pallas
    cost_pallas.POPCOUNT_IMPL = "native"  # r10/r13: exact on chip
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    kitti = PRESETS["kitti_sgm8"]          # carries frames_per_step=4
    k1 = kitti.replace(frames_per_step=1)

    # ---- 1. canary: small pallas-vs-jnp (compiled earlier today: cache) --
    L, R, _, _ = synthetic_pair((120, 320), disparity=20.0, slope=0.05,
                                seed=1)
    L, R = jnp.asarray(L), jnp.asarray(R)
    ok = exact("exact/small_pallas_vs_jnp", sgbm(L, R, k1),
               sgbm(L, R, k1.replace(backend="jnp")))
    if not ok:
        rec("verdict", "SMALL PALLAS != JNP — STOP")
        return 0

    # ---- 2. KITTI size, all pallas: F4 vs singles ------------------------
    F = 4
    pairs = [synthetic_pair((375, 1242), disparity=30.0 + 10 * f, slope=0.02,
                            seed=f) for f in range(F)]
    Ls = jnp.asarray(np.stack([p[0] for p in pairs]))
    Rs = jnp.asarray(np.stack([p[1] for p in pairs]))
    singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], k1))
                        for f in range(F)])
    out_fused = np.asarray(sgbm_frames(Ls, Rs, kitti))
    ok = exact("exact/kitti_F4_vs_singles", out_fused, singles)

    # ---- 3. EMIT_TRANSPOSED A/B at full geometry (validates the rank-4
    #         layout against the r15-era external-transpose program) -------
    sgm_pallas.EMIT_TRANSPOSED = False
    jax.clear_caches()
    out_ext = np.asarray(sgbm_frames(Ls, Rs, kitti))
    ok &= exact("exact/emit_t_fused_vs_external", out_fused, out_ext)
    r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
    rec("bench/kitti_F4_b16_EXTERNAL_transpose",
        {k: r[k] for k in ("value", "ms_per_frame")})
    sgm_pallas.EMIT_TRANSPOSED = True
    jax.clear_caches()
    if not ok:
        rec("verdict", "KITTI PALLAS EXACTNESS FAILED — STOP")
        return 0

    # ---- 4. headline ------------------------------------------------------
    for batch in (16, 8):
        r = run_benchmark(kitti, shape=(375, 1242), batch=batch, iters=20)
        rec(f"bench/kitti_sgm8_F4_b{batch}",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})

    # ---- 5. micros: bitonic vs lax.sort, sgm_select ----------------------
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
        d, v, dr = sgm_select_pallas(c, k1, Ls[0], dims=(H, W, 128), Ct=Ct)
        return d.sum() + dr.sum()

    ms = _timed_device_loop(select, C, iters=10) * 1e3
    rec("micro/sgm_select_fusedSt_ms", round(ms, 3))  # r16: 14.365

    # ---- 6. speckle A/B pipeline-shaped (bitonic vs lax) ------------------
    from tpustereo.ops.postproc import speckle_frames
    d1 = sgbm(Ls[0], Rs[0], k1.replace(speckle_window_size=0,
                                       median_filter=False))
    disp4 = jnp.broadcast_to(d1, (F,) + d1.shape)
    valid4 = disp4 >= 0

    def spk(d):
        return speckle_frames(d, valid4, kitti).sum()

    ms = _timed_device_loop(spk, disp4, iters=20) * 1e3
    rec("micro/speckle4_bitonic_ms", round(ms, 3))
    real_feasible = bitonic_pallas.bitonic_feasible
    bitonic_pallas.bitonic_feasible = lambda *a, **k: False
    jax.clear_caches()
    ms = _timed_device_loop(spk, disp4, iters=20) * 1e3
    rec("micro/speckle4_laxsort_ms", round(ms, 3))
    bitonic_pallas.bitonic_feasible = real_feasible
    jax.clear_caches()

    # ---- 7. other presets -------------------------------------------------
    r = run_benchmark(PRESETS["middlebury_sgm4"].replace(frames_per_step=F),
                      shape=(375, 1242), batch=8, iters=20)
    rec("bench/middlebury_sgm4_F4_b8",
        {k: r[k] for k in ("value", "ms_per_frame")})
    cfg_h = PRESETS["middlebury_sgm4"]
    r = run_benchmark(cfg_h, shape=(750, 1500), batch=4, iters=10)
    rec("bench/middlebury_half_750x1500",
        {k: r[k] for k in ("value", "ms_per_frame")})  # r13: 37.9 ms
    try:
        r = run_benchmark(cfg_h, shape=(1500, 3000), batch=2, iters=5)
        rec("bench/middlebury_full_1500x3000",
            {k: r[k] for k in ("value", "ms_per_frame")})
    except Exception as e:  # noqa: BLE001
        rec("bench/middlebury_full_1500x3000", {"error": repr(e)[:300]})

    # ---- 8. slow jnp-reference gates LAST ---------------------------------
    Lh, Rh, _, _ = synthetic_pair((750, 1500), disparity=60.0, slope=0.03,
                                  seed=9)
    Lh, Rh = jnp.asarray(Lh), jnp.asarray(Rh)
    for key, (a, b, cfg) in {
        "exact/kitti_single_vs_jnp": (Ls[0], Rs[0], k1),
        "exact/middlebury_half_vs_jnp": (Lh, Rh, cfg_h),
    }.items():
        try:
            exact(key, sgbm(a, b, cfg), sgbm(a, b, cfg.replace(backend="jnp")))
        except Exception as e:  # noqa: BLE001
            rec(key, {"error": repr(e)[:300]})
    try:
        Lf, Rf, _, _ = synthetic_pair((1500, 3000), disparity=100.0,
                                      slope=0.03, seed=10)
        Lf, Rf = jnp.asarray(Lf), jnp.asarray(Rf)
        exact("exact/middlebury_full_vs_jnp", sgbm(Lf, Rf, cfg_h),
              sgbm(Lf, Rf, cfg_h.replace(backend="jnp")))
    except Exception as e:  # noqa: BLE001
        rec("exact/middlebury_full_vs_jnp", {"error": repr(e)[:300]})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
