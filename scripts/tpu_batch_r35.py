"""Round-3 TPU batch #35: final preset refresh at HEAD (vertical+fwd+bwd
all SWAR): midfull exactness re-gate + sgm4/9x7/odometry numbers."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r35_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark, run_odometry_benchmark, production_stage_times
    from tpustereo.pipeline.sgbm import sgbm
    rec("device", str(jax.devices()[0].device_kind))
    try:
        r = np.load("/tmp/r29_refs/midfull.npz")
        got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                              PRESETS["middlebury_sgm4"])).astype(np.float64)
        d = np.abs(got - r["out"])
        rec("exact/midfull_1500x3000", {"max_abs": float(d.max()), "n_mismatch": int((d > 1e-4).sum())})
    except Exception as e:
        rec("error/midfull", repr(e)[:400]); traceback.print_exc()
    for name, cfg, shape, batch in [
        ("middlebury_sgm4_F4_b8", PRESETS["middlebury_sgm4"].replace(frames_per_step=4), (375, 1242), 8),
        ("kitti_sgm8_9x7_b16", PRESETS["kitti_sgm8"].replace(census_window=(9, 7)), (375, 1242), 16),
    ]:
        try:
            r = run_benchmark(cfg, shape=shape, batch=batch, iters=20)
            rec(f"bench/{name}", {k: r[k] for k in ("value", "ms_per_frame")})
        except Exception as e:
            rec(f"error/{name}", repr(e)[:400]); traceback.print_exc()
    try:
        r = run_odometry_benchmark(PRESETS["kitti_odometry"], shape=(375, 1242), frames=4, iters=10)
        rec("odometry/fused_step_final", {k: r[k] for k in ("value", "ms_per_frame")})
    except Exception as e:
        rec("error/odometry", repr(e)[:400]); traceback.print_exc()
    try:
        refs = np.load("/tmp/r29_refs/kitti4.npz")
        Ls = jnp.asarray(np.concatenate([np.stack([refs[f"L{f}"] for f in range(4)])] * 4))
        Rs = jnp.asarray(np.concatenate([np.stack([refs[f"R{f}"] for f in range(4)])] * 4))
        t = production_stage_times(PRESETS["kitti_sgm8"], Ls, Rs, iters=20)
        rec("stages/final", t)
    except Exception as e:
        rec("error/stages", repr(e)[:400]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
