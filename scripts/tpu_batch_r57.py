"""Round-5 TPU batch #57: SWEEP_ROWS=4 adoption battery.

r56 measured the R-inversion under bf16 (R=4 80.86 vs R=1 79.82 fps).
Adopt at HEAD: exactness at R=4 (kitti f0 single + the F=4 stacked
headline composition vs CPU refs), the 3-run headline, and canaries on
every sweep-bearing operating point (sgm4, 9x7, D=256 F=2, mid750,
odometry fused, adaptive F=4 — the last pins that adaptive sweeps still
run R=1/lane-major and keep their 70.8).
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r57_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v, "t": round(time.time() - T0, 1)}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

T0 = time.time()


def main():
    import tpustereo
    tpustereo.enable_compilation_cache()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark, run_odometry_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    cfg = PRESETS["kitti_sgm8"]

    try:
        d = np.load("/tmp/r55_refs/kitti4.npz")
        out = np.asarray(sgbm(jnp.asarray(d["L0"]), jnp.asarray(d["R0"]),
                              cfg.replace(frames_per_step=1)))
        want = d["out0"]
        both = (out >= 0) & (want >= 0)
        rec("exact/r4_f0_mismatch", int(((out >= 0) != (want >= 0)).sum()))
        rec("exact/r4_f0_max_abs",
            float(np.abs(out - want)[both].max()) if both.any() else 0.0)
        Ls = jnp.asarray(np.stack([d[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([d[f"R{f}"] for f in range(4)]))
        outs = np.asarray(sgbm_frames(Ls, Rs, cfg))
        wants = np.stack([d[f"out{f}"] for f in range(4)])
        both = (outs >= 0) & (wants >= 0)
        rec("exact/r4_F4_mismatch",
            int(((outs >= 0) != (wants >= 0)).sum()))
        rec("exact/r4_F4_max_abs",
            float(np.abs(outs - wants)[both].max()) if both.any() else 0.0)
    except Exception as e:
        rec("error/exact", repr(e)[:400]); traceback.print_exc()

    try:
        vals = []
        for _ in range(3):
            r = run_benchmark(cfg, shape=(375, 1242), batch=16, iters=20)
            vals.append(r["value"])
        vals.sort()
        rec("headline/r4_3run", vals)
        rec("headline/r4_mean", round(sum(vals) / 3, 3))
    except Exception as e:
        rec("error/headline", repr(e)[:400]); traceback.print_exc()

    for name, c, shape, batch, iters in (
            ("sgm4", PRESETS["middlebury_sgm4"], (375, 1242), 16, 20),
            ("census97", cfg.replace(census_window=(9, 7)),
             (375, 1242), 16, 20),
            ("d256_f2", cfg.replace(num_disparities=256,
                                    frames_per_step=2), (375, 1242), 8, 10),
            ("mid750", PRESETS["middlebury_sgm4"], (750, 1500), 4, 10),
            ("ap2_f4", cfg.replace(adaptive_p2=True), (375, 1242), 16, 20)):
        try:
            r = run_benchmark(c, shape=shape, batch=batch, iters=iters)
            rec(f"canary/{name}_fps", r["value"])
        except Exception as e:
            rec(f"error/{name}", repr(e)[:400]); traceback.print_exc()

    try:
        r = run_odometry_benchmark(PRESETS["kitti_odometry"],
                                   shape=(375, 1242), frames=4, iters=10)
        rec("canary/odometry_fused_fps", r["value"])
    except Exception as e:
        rec("error/odo", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
