"""Round-2 TPU batch #27: mid-geometry rows re-measured with unstable
sorts (their BASELINE rows predate r26), plus a final headline confirm."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r27_results.json"
REFS = "/tmp/r20_refs"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm
    cfg_h = PRESETS["middlebury_sgm4"]
    for name, cfg, shape, batch, iters in (
            ("middlebury_sgm4_F4_b8", cfg_h.replace(frames_per_step=4),
             (375, 1242), 8, 20),
            ("middlebury_half_750x1500", cfg_h, (750, 1500), 4, 10),
            ("middlebury_full_1500x3000", cfg_h, (1500, 3000), 2, 5),
            ("kitti_sgm8_F4_b16", PRESETS["kitti_sgm8"], (375, 1242), 16, 20),
    ):
        try:
            r = run_benchmark(cfg, shape=shape, batch=batch, iters=iters)
            rec(f"bench/{name}", {k: r[k] for k in ("value", "ms_per_frame")})
        except Exception as e:
            rec(f"error/{name}", repr(e)[:300]); traceback.print_exc()
    # midhalf exactness with unstable sorts
    try:
        rh = np.load(f"{REFS}/midhalf.npz")
        got = np.asarray(sgbm(jnp.asarray(rh["L"]), jnp.asarray(rh["R"]),
                              cfg_h)).astype(np.float64)
        d = np.abs(got - rh["out"])
        rec("exact/midhalf_vs_cpu", {"max_abs": float(d.max()),
                                     "n_mismatch": int((d > 1e-4).sum())})
    except Exception as e:
        rec("error/exact", repr(e)[:300]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
