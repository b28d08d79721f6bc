"""Round-4 TPU batch #44: full regate at HEAD with SWEEP_BF16 as the
default (run ONLY after r43 confirms the bf16 branch exact + faster).

Every geometry the round-3/4 gates covered is re-verified vs CPU refs
with the bf16 sweeps, then the preset benches are re-recorded:
  exact: kitti4 f0 + F=4 frames, midhalf 750x1500, midfull 1500x3000,
         mindisp, d256, d512, census97 (9x7, c_max=62 — the largest
         bf16-gated cost bound)
  bench: headline 3x (+stages), sgm4, 9x7, D=256 F=2, odometry fused +
         tiled
Refs regenerate first if /tmp was wiped (CPU subprocess, BEFORE any
timing — the r40 run0 lesson).
"""
import json, os, subprocess, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r44_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

CASES = {  # case -> refs path
    "small": "/tmp/r29_refs/small.npz",
    "kitti4": "/tmp/r29_refs/kitti4.npz",
    "midhalf": "/tmp/r29_refs/midhalf.npz",
    "midfull": "/tmp/r29_refs/midfull.npz",
    "mindisp": "/tmp/r40_refs/mindisp.npz",
    "d256": "/tmp/r40_refs/d256.npz",
    "d512": "/tmp/r42_refs/d512.npz",
    "census97": "/tmp/r44_refs/census97.npz",
}

def ensure_refs():
    for case, path in CASES.items():
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            t = time.time()
            subprocess.run([sys.executable, "scripts/cpu_refs_helper.py",
                            path, case], check=True)
            rec(f"refs/{case}_s", round(time.time() - t, 1))

def main():
    t0 = time.time()
    ensure_refs()
    import jax, jax.numpy as jnp
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark, run_odometry_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    rec("sweep_bf16_default", sp.SWEEP_BF16)
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)
    cfg_h = PRESETS["middlebury_sgm4"]

    def gate(name, npz, cfg, tol=1e-4):
        r = np.load(npz)
        got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                              cfg)).astype(np.float64)
        d = np.abs(got - r["out"])
        rec(f"exact/{name}", {"max_abs": float(d.max()),
                              "n_mismatch": int((d > tol).sum()),
                              "n_px": int(d.size)})

    # exactness battery (each its own try so one failure doesn't stop the
    # rest)
    for name, npz, cfg in (
            ("kitti_f0", None, k1),  # special-cased below
            ("midhalf", CASES["midhalf"], cfg_h),
            ("midfull", CASES["midfull"], cfg_h),
            ("mindisp", CASES["mindisp"], k1.replace(min_disparity=16)),
            ("d256", CASES["d256"], k1.replace(num_disparities=256)),
            ("d512", CASES["d512"], k1.replace(num_disparities=512)),
            ("census97", CASES["census97"],
             k1.replace(census_window=(9, 7)))):
        try:
            if name == "kitti_f0":
                r = np.load(CASES["kitti4"])
                got = np.asarray(sgbm(jnp.asarray(r["L0"]),
                                      jnp.asarray(r["R0"]),
                                      k1)).astype(np.float64)
                d = np.abs(got - r["out0"])
                rec("exact/kitti_f0", {"max_abs": float(d.max()),
                                       "n_mismatch": int((d > 1e-4).sum())})
            else:
                gate(name, npz, cfg)
        except Exception as e:
            rec(f"error/{name}", repr(e)[:500]); traceback.print_exc()

    # F=4 frame-stacked exactness (the judged composition's kernel set)
    try:
        r = np.load(CASES["kitti4"])
        cfg4 = PRESETS["kitti_sgm8"]
        Ls = jnp.asarray(np.stack([r[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([r[f"R{f}"] for f in range(4)]))
        got = np.asarray(sgbm_frames(Ls, Rs, cfg4)).astype(np.float64)
        exp = np.stack([r[f"out{f}"] for f in range(4)])
        d = np.abs(got - exp)
        rec("exact/kitti_f4", {"max_abs": float(d.max()),
                               "n_mismatch": int((d > 1e-4).sum()),
                               "n_px": int(d.size)})
    except Exception as e:
        rec("error/kitti_f4", repr(e)[:500]); traceback.print_exc()

    # benches at HEAD defaults
    for key, cfg, shape, batch, kw in (
            ("headline_stages", PRESETS["kitti_sgm8"], (375, 1242), 16,
             dict(stages=True)),
            ("headline_run1", PRESETS["kitti_sgm8"], (375, 1242), 16, {}),
            ("headline_run2", PRESETS["kitti_sgm8"], (375, 1242), 16, {}),
            ("sgm4", PRESETS["middlebury_sgm4"], (375, 1242), 8, {}),
            ("kitti_9x7",
             PRESETS["kitti_sgm8"].replace(census_window=(9, 7)),
             (375, 1242), 16, {}),
            ("kitti_d256_f2",
             PRESETS["kitti_sgm8"].replace(num_disparities=256,
                                           frames_per_step=2),
             (375, 1242), 16, {})):
        try:
            r = run_benchmark(cfg, shape=shape, batch=batch, iters=20, **kw)
            rec(f"bench/{key}", {k: r[k] for k in ("value", "ms_per_frame")})
            if kw.get("stages"):
                rec("stages/head", r["stage_ms"])
        except Exception as e:
            rec(f"error/bench_{key}", repr(e)[:500]); traceback.print_exc()

    # sgm4 F=4 control with the bf16 sweeps off: the only published-vs-
    # HEAD comparison still open (the r43c/d/e sgm4 readings were F=1 —
    # the preset drifted from the published F=4 operating point)
    try:
        import tpustereo.kernels.sgm_pallas as sp
        sp.SWEEP_BF16 = False
        jax.clear_caches()
        r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(375, 1242),
                          batch=8, iters=20)
        rec("bench/sgm4_default_swar_f4", {k: r[k] for k in
                                           ("value", "ms_per_frame")})
    except Exception as e:
        rec("error/sgm4_control", repr(e)[:500]); traceback.print_exc()
    finally:
        sp.SWEEP_BF16 = True
        jax.clear_caches()

    for tiled in (False, True):
        try:
            r = run_odometry_benchmark(PRESETS["kitti_odometry"],
                                       shape=(375, 1242), frames=4,
                                       iters=10, tiled=tiled)
            rec(f"odometry/{'tiled' if tiled else 'fused'}",
                {k: r[k] for k in ("value", "ms_per_frame")})
        except Exception as e:
            rec(f"error/odo_{tiled}", repr(e)[:500]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
