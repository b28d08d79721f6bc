"""Round-2 TPU batch #21: headline with the measured defaults + MXU A/B.

Defaults changed after r20: speckle rides lax.sort (bitonic measured
slower), EMIT_TRANSPOSED off (external transpose measured faster), and
the new MXU-assisted WTA refinement (uniqueness count + subpixel one-hot
extraction as (N,D)@(D,1) matmuls instead of two roll-trees per column)
is ON — this batch A/Bs it and re-measures everything that matters.

Also: in-context postproc differencing (speckle / median / LR off one at
a time) to locate the next lever.
"""

import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r21_results.json"
REFS_DIR = "/tmp/r20_refs"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def exact(key, got, want, tol=1e-4):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    d = np.abs(got - want)
    bad = int((d > tol).sum())
    rec(key, {"max_abs": float(d.max()), "n_mismatch": bad,
              "n_px": int(got.size)})
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
    os.makedirs(REFS_DIR, exist_ok=True)
    for case in ("small", "kitti4", "midhalf"):
        path = f"{REFS_DIR}/{case}.npz"
        if not os.path.exists(path):
            subprocess.run([sys.executable, "scripts/cpu_refs_helper.py",
                            path, case], check=True)

    import jax
    import jax.numpy as jnp

    import tpustereo.kernels.cost_pallas as cost_pallas
    import tpustereo.kernels.sgm_pallas as sgm_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    kitti = PRESETS["kitti_sgm8"]
    k1 = kitti.replace(frames_per_step=1)
    cfg_h = PRESETS["middlebury_sgm4"]

    # ---- 1. canary: small exact with MXU refinement ------------------------
    r = np.load(f"{REFS_DIR}/small.npz")
    ok = exact("exact/small_MXU_vs_cpu",
               sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]), k1), r["out"])
    if not ok:
        rec("verdict", "MXU small canary failed — flipping MXU off")
        sgm_pallas.MXU_REFINE = False
        jax.clear_caches()

    # ---- 2. KITTI exactness + headline (new defaults) ----------------------
    r4 = np.load(f"{REFS_DIR}/kitti4.npz")
    Ls = jnp.asarray(np.stack([r4[f"L{f}"] for f in range(4)]))
    Rs = jnp.asarray(np.stack([r4[f"R{f}"] for f in range(4)]))
    outs_ref = np.stack([r4[f"out{f}"] for f in range(4)])

    @section("kitti")
    def kitti_sec():
        fused = np.asarray(sgbm_frames(Ls, Rs, kitti))
        exact("exact/kitti_F4_vs_cpu", fused, outs_ref)
        for batch in (16, 32):
            r = run_benchmark(kitti, shape=(375, 1242), batch=batch,
                              iters=20)
            rec(f"bench/kitti_sgm8_F4_b{batch}",
                {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})

    kitti_sec()

    # ---- 3. MXU A/B ---------------------------------------------------------
    @section("mxu_ab")
    def mxu_ab():
        on = sgm_pallas.MXU_REFINE
        sgm_pallas.MXU_REFINE = not on
        jax.clear_caches()
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec(f"bench/kitti_F4_b16_MXU_{'off' if on else 'on'}",
            {k: r[k] for k in ("value", "ms_per_frame")})
        sgm_pallas.MXU_REFINE = on
        jax.clear_caches()

    mxu_ab()

    # ---- 4. in-context postproc differencing -------------------------------
    @section("diff")
    def diff():
        variants = {
            "nospeckle": dict(speckle_window_size=0),
            "nomedian": dict(median_filter=False),
            "noLR": dict(disp12_max_diff=-1),
            "nopost": dict(speckle_window_size=0, median_filter=False,
                           disp12_max_diff=-1),
        }
        for name, kw in variants.items():
            r = run_benchmark(kitti.replace(**kw), shape=(375, 1242),
                              batch=16, iters=20)
            rec(f"bench/kitti_F4_b16_{name}",
                {k: r[k] for k in ("value", "ms_per_frame")})

    diff()

    # ---- 5. select micro with new defaults ---------------------------------
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
        rec("micro/sgm_select_MXU_extT_ms", round(ms, 3))  # r16: 14.365

    select_micro()

    # ---- 6. Middlebury with new defaults ------------------------------------
    @section("mid")
    def mid():
        rh = np.load(f"{REFS_DIR}/midhalf.npz")
        exact("exact/midhalf_vs_cpu",
              sgbm(jnp.asarray(rh["L"]), jnp.asarray(rh["R"]), cfg_h),
              rh["out"])
        r = run_benchmark(cfg_h.replace(frames_per_step=4),
                          shape=(375, 1242), batch=8, iters=20)
        rec("bench/middlebury_sgm4_F4_b8",
            {k: r[k] for k in ("value", "ms_per_frame")})
        r = run_benchmark(cfg_h, shape=(750, 1500), batch=4, iters=10)
        rec("bench/middlebury_half_750x1500",
            {k: r[k] for k in ("value", "ms_per_frame")})

    mid()

    @section("midfull")
    def midfull():
        rf = np.load(f"{REFS_DIR}/midfull.npz")
        exact("exact/midfull_vs_cpu",
              sgbm(jnp.asarray(rf["L"]), jnp.asarray(rf["R"]), cfg_h),
              rf["out"])
        r = run_benchmark(cfg_h, shape=(1500, 3000), batch=2, iters=5)
        rec("bench/middlebury_full_1500x3000",
            {k: r[k] for k in ("value", "ms_per_frame")})

    midfull()

    # ---- 7. other presets (tsukuba SAD + census_wta) ------------------------
    @section("other_presets")
    def other_presets():
        r = run_benchmark(PRESETS["tsukuba_sad"], shape=(288, 384),
                          batch=16, iters=20)
        rec("bench/tsukuba_sad", {k: r[k] for k in ("value", "ms_per_frame")})
        r = run_benchmark(PRESETS["middlebury_census_wta"],
                          shape=(375, 621), batch=16, iters=20)
        rec("bench/census_wta", {k: r[k] for k in ("value", "ms_per_frame")})

    other_presets()

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
