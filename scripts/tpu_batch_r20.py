"""Round-2 TPU batch #20: full validation + measurement after the r19 fixes.

Changes validated here:
  * split emitted-S vertical sweeps + masked-RMW emission (r19: compiled
    and ran on-chip, exact in every isolation);
  * block-bitonic sort (2^17 parts; whole-array pair mode measured
    16.02-17.58 MB scoped VMEM — over budget);
  * exactness gates now compare against CPU-COMPUTED references
    (cpu_refs_helper subprocess): the jnp pipeline itself miscompiles on
    the TPU at 750x1500 (XLA bug, r19 diag) and its TPU compiles took
    ~1 h each anyway.

Order: small canary -> bitonic probes -> KITTI exactness -> emission A/B
-> headline -> micros -> F8 probe -> Middlebury half/full. Sections are
try/except'd; results written incrementally.
"""

import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r20_results.json"
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

    # ---- 0. CPU truth references, computed in parallel subprocesses ----
    os.makedirs(REFS_DIR, exist_ok=True)
    procs = {}
    for case in ("small", "kitti4", "midhalf", "midfull"):
        path = f"{REFS_DIR}/{case}.npz"
        if not os.path.exists(path):
            procs[case] = subprocess.Popen(
                [sys.executable, "scripts/cpu_refs_helper.py", path, case],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)

    def refs(case):
        p = procs.get(case)
        if p is not None:
            rc = p.wait()
            assert rc == 0, (case, rc)
        return np.load(f"{REFS_DIR}/{case}.npz")

    import jax
    import jax.numpy as jnp

    import tpustereo.kernels.bitonic_pallas as bitonic_pallas
    import tpustereo.kernels.cost_pallas as cost_pallas
    import tpustereo.kernels.sgm_pallas as sgm_pallas
    cost_pallas.POPCOUNT_IMPL = "native"  # r10/r13: exact on chip
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    kitti = PRESETS["kitti_sgm8"]          # carries frames_per_step=4
    k1 = kitti.replace(frames_per_step=1)
    cfg_h = PRESETS["middlebury_sgm4"]

    # ---- 1. small canary --------------------------------------------------
    r = refs("small")
    L, R = jnp.asarray(r["L"]), jnp.asarray(r["R"])
    if not exact("exact/small_vs_cpu", sgbm(L, R, k1), r["out"]):
        rec("verdict", "SMALL CANARY FAILED — STOP")
        return 0

    # ---- 2. bitonic probes (block kernels) --------------------------------
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

    # ---- 3. KITTI exactness: singles vs CPU, F4 vs singles ----------------
    r4 = refs("kitti4")
    Ls = jnp.asarray(np.stack([r4[f"L{f}"] for f in range(4)]))
    Rs = jnp.asarray(np.stack([r4[f"R{f}"] for f in range(4)]))
    outs_ref = np.stack([r4[f"out{f}"] for f in range(4)])
    state = {"ok": False}

    @section("kitti_exact")
    def kitti_exact():
        singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], k1))
                            for f in range(4)])
        ok = exact("exact/kitti_singles_vs_cpu", singles, outs_ref)
        fused = np.asarray(sgbm_frames(Ls, Rs, kitti))
        ok &= exact("exact/kitti_F4_vs_cpu", fused, outs_ref)
        state["ok"] = ok

    kitti_exact()

    # ---- 4. EMIT_TRANSPOSED A/B -------------------------------------------
    @section("emit_ab")
    def emit_ab():
        sgm_pallas.EMIT_TRANSPOSED = False
        jax.clear_caches()
        out_ext = np.asarray(sgbm_frames(Ls, Rs, kitti))
        exact("exact/kitti_F4_EMIToff_vs_cpu", out_ext, outs_ref)
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_EXTERNAL_transpose",
            {k: r[k] for k in ("value", "ms_per_frame")})
        sgm_pallas.EMIT_TRANSPOSED = True
        jax.clear_caches()

    emit_ab()

    # ---- 5. headline --------------------------------------------------------
    @section("headline")
    def headline():
        for batch in (16, 8):
            r = run_benchmark(kitti, shape=(375, 1242), batch=batch,
                              iters=20)
            rec(f"bench/kitti_sgm8_F4_b{batch}",
                {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})

    headline()

    # ---- 6. micros ----------------------------------------------------------
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
        rec("micro/sgm_select_fusedSt_ms", round(ms, 3))  # r16 ext: 14.365

    select_micro()

    @section("speckle_ab")
    def speckle_ab():
        from tpustereo.ops.postproc import speckle_frames
        d1 = sgbm(Ls[0], Rs[0], k1.replace(speckle_window_size=0,
                                           median_filter=False))
        disp4 = jnp.broadcast_to(d1, (4,) + d1.shape)
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

    # ---- 7. F=8 probe ---------------------------------------------------------
    @section("f8")
    def f8():
        k8 = kitti.replace(frames_per_step=8)
        Ls8 = jnp.concatenate([Ls, Ls], axis=0)
        Rs8 = jnp.concatenate([Rs, Rs], axis=0)
        fused8 = np.asarray(sgbm_frames(Ls8, Rs8, k8))
        exact("exact/kitti_F8_vs_cpu", fused8,
              np.concatenate([outs_ref, outs_ref], axis=0))
        r = run_benchmark(k8, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_sgm8_F8_b16",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})

    f8()

    # ---- 8. Middlebury-scale: bench + exactness vs CPU refs -------------------
    @section("presets")
    def presets():
        r = run_benchmark(cfg_h.replace(frames_per_step=4),
                          shape=(375, 1242), batch=8, iters=20)
        rec("bench/middlebury_sgm4_F4_b8",
            {k: r[k] for k in ("value", "ms_per_frame")})
        rh = refs("midhalf")
        exact("exact/midhalf_vs_cpu",
              sgbm(jnp.asarray(rh["L"]), jnp.asarray(rh["R"]), cfg_h),
              rh["out"])
        r = run_benchmark(cfg_h, shape=(750, 1500), batch=4, iters=10)
        rec("bench/middlebury_half_750x1500",
            {k: r[k] for k in ("value", "ms_per_frame")})  # r13: 37.9 ms

    presets()

    @section("midfull")
    def midfull():
        rf = refs("midfull")
        exact("exact/midfull_vs_cpu",
              sgbm(jnp.asarray(rf["L"]), jnp.asarray(rf["R"]), cfg_h),
              rf["out"])
        r = run_benchmark(cfg_h, shape=(1500, 3000), batch=2, iters=5)
        rec("bench/middlebury_full_1500x3000",
            {k: r[k] for k in ("value", "ms_per_frame")})

    midfull()

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
