"""Round-2 TPU batch #19: re-validate + measure after the r17 OOM fixes.

r17 on-chip lessons this batch verifies the fixes for:
  * up sweep with (C, S_in, transposed-out, jnp.stack emission) hit
    24.22 MB scoped VMEM at KITTI geometry -> now BOTH vertical sweeps
    emit transposed with NO S_in (masked-RMW emission), and the fwd
    horizontal sweep takes two S operands;
  * bitonic pair mode hit 16.02 MB (24 KB over) -> flat-index slab
    replaced by lane/row bit reads.

Ordering: riskiest new compiles first (bitonic, fused KITTI program),
then the headline, then micros/presets; the hour-long jnp-reference
gates run last. Every section is try/except'd and results are written
incrementally.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r19_results.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def exact(key, a, b, tol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    bad = int((np.abs(a.astype(np.float64) - b.astype(np.float64)) > tol)
              .sum())
    rec(key, {"max_abs": float(np.abs(a.astype(np.float64)
                                      - b.astype(np.float64)).max()),
              "n_mismatch": bad, "n_px": int(a.size)})
    return bad == 0


def section(name):
    def deco(fn):
        def run(*a, **k):
            try:
                return fn(*a, **k)
            except Exception as e:  # noqa: BLE001
                rec(f"error/{name}", repr(e)[:400])
                traceback.print_exc()
                return None
        return run
    return deco


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    import tpustereo.kernels.bitonic_pallas as bitonic_pallas
    import tpustereo.kernels.cost_pallas as cost_pallas
    import tpustereo.kernels.sgm_pallas as sgm_pallas
    cost_pallas.POPCOUNT_IMPL = "native"  # r10/r13: exact on chip
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    kitti = PRESETS["kitti_sgm8"]          # carries frames_per_step=4
    k1 = kitti.replace(frames_per_step=1)

    # ---- 1. bitonic probes (the 24 KB-over shape, now minus 2 MB) -------
    @section("bitonic")
    def bitonic():
        H, W = 375, 1242
        n = H * W
        rng = np.random.default_rng(0)
        lab_np = rng.integers(0, n, (n,), dtype=np.int32)
        lab = jnp.asarray(lab_np)
        idx = jnp.arange(n, dtype=jnp.int32)
        from tpustereo.kernels import bitonic_sort_pallas
        ks, ps = jax.jit(lambda f: bitonic_sort_pallas(f, idx))(lab)
        ks, ps = np.asarray(ks), np.asarray(ps)
        ok = bool((ks == np.sort(lab_np)).all())
        # payload must be a permutation pairing each key with its index
        ok &= bool((lab_np[ps] == ks).all())
        ok &= bool((np.sort(ps) == np.arange(n)).all())
        rec("exact/bitonic_pair_465k", ok)
        k2 = np.asarray(jax.jit(lambda f: bitonic_sort_pallas(f))(lab))
        rec("exact/bitonic_keys_465k", bool((k2 == np.sort(lab_np)).all()))
        ms = _timed_device_loop(
            lambda f: bitonic_sort_pallas(f, idx)[0].sum(), lab,
            iters=20) * 1e3
        rec("micro/bitonic_pair_465k_ms", round(ms, 3))
        ms = _timed_device_loop(
            lambda f: bitonic_sort_pallas(f).sum(), lab, iters=20) * 1e3
        rec("micro/bitonic_keys_465k_ms", round(ms, 3))
        ms = _timed_device_loop(
            lambda f: jax.lax.sort((f, idx), num_keys=1)[0].sum(), lab,
            iters=20) * 1e3
        rec("micro/laxsort_pair_465k_ms", round(ms, 3))

    bitonic()

    # ---- 2. small canary + KITTI fused-emit exactness --------------------
    L, R, _, _ = synthetic_pair((120, 320), disparity=20.0, slope=0.05,
                                seed=1)
    L, R = jnp.asarray(L), jnp.asarray(R)
    ok = exact("exact/small_pallas_vs_jnp", sgbm(L, R, k1),
               sgbm(L, R, k1.replace(backend="jnp")))
    if not ok:
        rec("verdict", "SMALL PALLAS != JNP — STOP")
        return 0

    F = 4
    pairs = [synthetic_pair((375, 1242), disparity=30.0 + 10 * f, slope=0.02,
                            seed=f) for f in range(F)]
    Ls = jnp.asarray(np.stack([p[0] for p in pairs]))
    Rs = jnp.asarray(np.stack([p[1] for p in pairs]))

    state = {"singles": None, "fused": None}

    @section("kitti_fused")
    def kitti_fused():
        singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], k1))
                            for f in range(F)])
        out_fused = np.asarray(sgbm_frames(Ls, Rs, kitti))
        exact("exact/kitti_F4_vs_singles", out_fused, singles)
        state["singles"], state["fused"] = singles, out_fused

    kitti_fused()

    # ---- 3. EMIT_TRANSPOSED A/B at full geometry --------------------------
    @section("emit_ab")
    def emit_ab():
        sgm_pallas.EMIT_TRANSPOSED = False
        jax.clear_caches()
        out_ext = np.asarray(sgbm_frames(Ls, Rs, kitti))
        if state["fused"] is not None:
            exact("exact/emit_t_fused_vs_external", state["fused"], out_ext)
        elif state["singles"] is not None:
            exact("exact/external_vs_singles", out_ext, state["singles"])
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_EXTERNAL_transpose",
            {k: r[k] for k in ("value", "ms_per_frame")})
        sgm_pallas.EMIT_TRANSPOSED = True
        jax.clear_caches()

    emit_ab()

    # ---- 4. headline ------------------------------------------------------
    @section("headline")
    def headline():
        for batch in (16, 8):
            r = run_benchmark(kitti, shape=(375, 1242), batch=batch,
                              iters=20)
            rec(f"bench/kitti_sgm8_F4_b{batch}",
                {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})

    headline()

    # ---- 5. micros: sgm_select with the new emission ----------------------
    @section("select_micro")
    def select_micro():
        from tpustereo.kernels import (census_cost_volume_pallas,
                                       sgm_select_pallas)
        H, W = 375, 1242
        C, Ct = census_cost_volume_pallas(Ls[0], Rs[0], 128, 24, (5, 5),
                                          padded=True, with_transposed=True)

        def select(c):
            d, v, dr = sgm_select_pallas(c, k1, Ls[0], dims=(H, W, 128),
                                         Ct=Ct)
            return d.sum() + dr.sum()

        ms = _timed_device_loop(select, C, iters=10) * 1e3
        rec("micro/sgm_select_fusedSt_ms", round(ms, 3))  # r16 external: 14.365

    select_micro()

    # ---- 6. speckle A/B pipeline-shaped (bitonic vs lax) -------------------
    @section("speckle_ab")
    def speckle_ab():
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

    speckle_ab()

    # ---- 7. other presets ---------------------------------------------------
    @section("presets")
    def presets():
        r = run_benchmark(PRESETS["middlebury_sgm4"].replace(
            frames_per_step=F), shape=(375, 1242), batch=8, iters=20)
        rec("bench/middlebury_sgm4_F4_b8",
            {k: r[k] for k in ("value", "ms_per_frame")})
        cfg_h = PRESETS["middlebury_sgm4"]
        r = run_benchmark(cfg_h, shape=(750, 1500), batch=4, iters=10)
        rec("bench/middlebury_half_750x1500",
            {k: r[k] for k in ("value", "ms_per_frame")})  # r13: 37.9 ms
        r = run_benchmark(cfg_h, shape=(1500, 3000), batch=2, iters=5)
        rec("bench/middlebury_full_1500x3000",
            {k: r[k] for k in ("value", "ms_per_frame")})

    presets()

    # ---- 8. slow jnp-reference gates LAST -----------------------------------
    cfg_h = PRESETS["middlebury_sgm4"]
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
