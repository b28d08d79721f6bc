"""Round-3 TPU batch #31: SWAR-default full re-validation + preset table
refresh. Exactness gates at every judged geometry (the r19 lesson: gates
compare pallas-on-TPU vs CPU-computed references), then the BASELINE.md
preset benches and the odometry fused-step number, all at HEAD defaults
(SWEEP_SWAR=True with the negative-AND workaround)."""
import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r31_results.json"
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


def refs(case):
    os.makedirs(REFS, exist_ok=True)
    path = f"{REFS}/{case}.npz"
    if not os.path.exists(path):
        subprocess.run([sys.executable, "scripts/cpu_refs_helper.py", path,
                        case], check=True, timeout=3600)
    return np.load(path)


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark, run_odometry_benchmark
    from tpustereo.pipeline.sgbm import sgbm
    rec("device", str(jax.devices()[0].device_kind))
    rec("SWEEP_SWAR", sp.SWEEP_SWAR)

    def exact(name, cfg, case):
        r = refs(case)
        got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                              cfg)).astype(np.float64)
        d = np.abs(got - r["out"])
        rec(f"exact/{name}", {"max_abs": float(d.max()),
                              "n_mismatch": int((d > 1e-4).sum()),
                              "n_px": int(got.size)})

    @section("exact_mid")
    def exact_mid():
        exact("midhalf_750x1500", PRESETS["middlebury_sgm4"], "midhalf")
        exact("midfull_1500x3000", PRESETS["middlebury_sgm4"], "midfull")

    exact_mid()

    @section("presets")
    def presets():
        cases = [
            ("kitti_sgm8_F4_b16", PRESETS["kitti_sgm8"], (375, 1242), 16),
            ("middlebury_sgm4_F4_b8",
             PRESETS["middlebury_sgm4"].replace(frames_per_step=4),
             (375, 1242), 8),
            ("middlebury_census_wta_b16", PRESETS["middlebury_census_wta"],
             (375, 621), 16),
            ("tsukuba_sad_b16", PRESETS["tsukuba_sad"], (288, 384), 16),
            ("kitti_sgm8_9x7_b16",
             PRESETS["kitti_sgm8"].replace(census_window=(9, 7)),
             (375, 1242), 16),
        ]
        for name, cfg, shape, batch in cases:
            try:
                r = run_benchmark(cfg, shape=shape, batch=batch, iters=20)
                rec(f"bench/{name}",
                    {k: r[k] for k in ("value", "ms_per_frame")})
            except Exception as e:  # noqa: BLE001
                rec(f"error/bench_{name}", repr(e)[:400])
                traceback.print_exc()

    presets()

    @section("roofline_stages")
    def roofline_stages():
        from tpustereo.eval.bench import production_stage_times
        r4 = refs("kitti4")
        Ls = jnp.asarray(np.concatenate(
            [np.stack([r4[f"L{f}"] for f in range(4)])] * 4))
        Rs = jnp.asarray(np.concatenate(
            [np.stack([r4[f"R{f}"] for f in range(4)])] * 4))
        t = production_stage_times(PRESETS["kitti_sgm8"], Ls, Rs, iters=20)
        rec("stages/kitti_F4_b16_swar", t)
        from tpustereo.eval.roofline import roofline
        rec("roofline/swar_core", roofline(
            PRESETS["kitti_sgm8"], (375, 1242), t["full_pipeline"] / 1e3,
            device_kind=str(jax.devices()[0].device_kind),
            core_sec_per_frame=t["core(cost+sweeps+wta)"] / 1e3))

    roofline_stages()

    @section("odometry")
    def odometry():
        r = run_odometry_benchmark(PRESETS["kitti_odometry"].replace(strips=1),
                                   shape=(375, 1242), frames=4, iters=10)
        rec("odometry/fused_step_swar",
            {k: r[k] for k in ("value", "ms_per_frame")})

    odometry()

    rec("total_wall_s", round(time.time() - t0, 1))


if __name__ == "__main__":
    sys.exit(main())
