"""Round-3 TPU batch #29: the VERDICT r2 measurement slate.

1. canary: kitti_sgm8 F=4 exact vs CPU refs at HEAD (fused-odometry round
   touched no pipeline kernels — this proves it).
2. headline: kitti F=4 b16 bench (+ analytic roofline rides the record).
3. odometry: fused-step fps at full KITTI geometry (VERDICT #1's number)
   + the host-interactive 5-frame smoke (wall-clock vs r28's 1-2 s/frame).
4. stages: the production differenced decomposition from the new
   `bench --stages` path (VERDICT weak #2) -> core time for the roofline.
5. speckle scatter-distribute A/B (VERDICT #4: single-sort speckle).
6. data-width micros: SWAR 2x16 sweep step vs int32; int16 vs int32
   elementwise chain (VERDICT #3).
7. profiler trace -> device busy fraction (best effort on the tunnel).
"""
import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r29_results.json"
REFS = "/tmp/r29_refs"
results = {}


def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)


def section(name):
    def deco(fn):
        def run(*a, **k):
            t0 = time.time()
            try:
                out = fn(*a, **k)
                rec(f"wall_s/{name}", round(time.time() - t0, 1))
                return out
            except Exception as e:  # noqa: BLE001
                rec(f"error/{name}", repr(e)[:400])
                traceback.print_exc()
                return None
        return run
    return deco


def ensure_refs():
    os.makedirs(REFS, exist_ok=True)
    path = f"{REFS}/kitti4.npz"
    if not os.path.exists(path):
        subprocess.run([sys.executable, "scripts/cpu_refs_helper.py", path,
                        "kitti4"], check=True, timeout=1800)
    return np.load(path)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import (_timed_device_loop,
                                      production_stage_times,
                                      run_benchmark, run_odometry_benchmark)
    from tpustereo.pipeline.sgbm import sgbm_frames

    kitti = PRESETS["kitti_sgm8"]
    refs = ensure_refs()
    Ls = jnp.asarray(np.stack([refs[f"L{f}"] for f in range(4)]))
    Rs = jnp.asarray(np.stack([refs[f"R{f}"] for f in range(4)]))
    outs_ref = np.stack([refs[f"out{f}"] for f in range(4)])

    # ---- 1. canary exactness -------------------------------------------
    @section("canary")
    def canary():
        got = np.asarray(sgbm_frames(Ls, Rs, kitti)).astype(np.float64)
        d = np.abs(got - outs_ref)
        rec("exact/kitti_F4_vs_cpu",
            {"max_abs": float(d.max()), "n_mismatch": int((d > 1e-4).sum()),
             "n_px": int(got.size)})

    canary()

    # ---- 2. headline ----------------------------------------------------
    @section("headline")
    def headline():
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
        rec("roofline/frame", r["roofline"])

    headline()

    # ---- 3. odometry ----------------------------------------------------
    odo_cfg = PRESETS["kitti_odometry"].replace(strips=1)

    @section("odometry_fused")
    def odometry_fused():
        r = run_odometry_benchmark(odo_cfg, shape=(375, 1242), frames=4,
                                   iters=10)
        rec("odometry/fused_step",
            {k: r[k] for k in ("value", "ms_per_frame", "max_corners")})

    odometry_fused()

    @section("odometry_smoke")
    def odometry_smoke():
        from tpustereo.data.synthetic import synthetic_sequence
        from tpustereo.odometry import StereoOdometry
        calib, frames, _ = synthetic_sequence(
            n_frames=6, shape=(375, 1242), depth=12.0, fx=718.0,
            baseline=0.54, step_x=0.08, slant=0.35, seed=3)
        odo = StereoOdometry(calib, odo_cfg)
        poses, times = [], []
        for i, (L, R) in enumerate(frames):
            t0 = time.time()
            poses.append(odo.step(L, R))
            times.append(time.time() - t0)
        assert all(np.isfinite(p).all() for p in poses)
        # frame 0 pays the compile; steady state is what co-located
        # hardware-adjacent host loops would see (minus tunnel RTTs)
        rec("odometry/interactive_smoke",
            {"first_frame_s": round(times[0], 2),
             "steady_ms_per_frame": round(float(np.mean(times[2:])) * 1e3, 1),
             "frames": len(times)})

    odometry_smoke()

    # ---- 4. production stage decomposition ------------------------------
    @section("stages")
    def stages():
        L16 = jnp.asarray(np.concatenate([Ls] * 4))
        R16 = jnp.asarray(np.concatenate([Rs] * 4))
        t = production_stage_times(kitti, L16, R16, iters=20)
        rec("stages/kitti_F4_b16_production", t)

    stages()

    # ---- 5. speckle scatter-distribute A/B ------------------------------
    @section("speckle_scatter")
    def speckle_scatter():
        import tpustereo.ops.postproc as postproc
        postproc.SCATTER_DISTRIBUTE = True
        jax.clear_caches()
        try:
            got = np.asarray(sgbm_frames(Ls, Rs, kitti)).astype(np.float64)
            d = np.abs(got - outs_ref)
            rec("exact/kitti_F4_scatter_vs_cpu",
                {"max_abs": float(d.max()),
                 "n_mismatch": int((d > 1e-4).sum())})
            r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
            rec("bench/kitti_F4_b16_scatter_distribute",
                {k: r[k] for k in ("value", "ms_per_frame")})
        finally:
            postproc.SCATTER_DISTRIBUTE = False
            jax.clear_caches()

    speckle_scatter()

    # ---- 6. data-width micros -------------------------------------------
    @section("width_micro")
    def width_micro():
        from tpustereo.kernels.width_micro import (elem_chain_micro,
                                                   pack_rows, sweep_micro,
                                                   unpack_rows)
        rng = np.random.default_rng(0)
        T, N, D = 376, 1280, 128  # the KITTI vertical-sweep slab geometry
        C = jnp.asarray(rng.integers(0, 25, (T, N, D)).astype(np.int32))
        P = pack_rows(C)
        # exactness on chip first (interpret mode cannot catch Mosaic bugs)
        small = C[:8, :64]
        want = np.asarray(sweep_micro(small, "v32"))
        got = np.asarray(unpack_rows(sweep_micro(pack_rows(small), "swar")))
        rec("width/swar_exact_on_chip",
            {"n_mismatch": int((want != got).sum())})
        s32 = _timed_device_loop(lambda c: sweep_micro(c, "v32"), C, iters=10)
        ssw = _timed_device_loop(lambda c: sweep_micro(c, "swar"), P, iters=10)
        rec("width/sweep_step_us",
            {"v32": round(s32 / T * 1e6, 3), "swar_packed": round(ssw / T * 1e6, 3),
             "swar_vs_v32": round(ssw / s32, 3)})
        x32 = jnp.asarray(rng.integers(0, 100, (1248, 128)).astype(np.int32))
        x16 = x32.astype(jnp.int16)
        e32 = _timed_device_loop(lambda x: elem_chain_micro(x, 64), x32,
                                 iters=10)
        e16 = _timed_device_loop(lambda x: elem_chain_micro(x, 64), x16,
                                 iters=10)
        rec("width/elem_chain64_us",
            {"int32": round(e32 * 1e6, 2), "int16": round(e16 * 1e6, 2),
             "int16_vs_int32": round(e16 / e32, 3)})

    width_micro()

    # ---- 7. profiler busy fraction (best effort) ------------------------
    @section("profile")
    def profile():
        trace_dir = "/tmp/r29_trace"
        r = run_benchmark(kitti, shape=(375, 1242), batch=4, iters=5,
                          profile_dir=trace_dir)
        rec("profile/device_busy_fraction",
            r.get("device_busy_fraction", "unavailable"))

    profile()

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
