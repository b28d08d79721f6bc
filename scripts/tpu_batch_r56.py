"""Round-5 TPU batch #56: sweep-R re-A/B under the bf16 step.

The r20 R-study (R=1 fastest: 6.40 vs 6.64 at R=4) predates the bf16
sweeps, which halve per-row compute — the DMA-granularity tradeoff may
have moved. Headline A/B at SWEEP_ROWS in {2, 4} vs the R=1 control
(cached), plus an exactness canary at the winning R if any wins.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r56_results.json"
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
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.kernels import sgm_pallas as sp
    from tpustereo.pipeline.sgbm import sgbm
    rec("device", str(jax.devices()[0].device_kind))
    cfg = PRESETS["kitti_sgm8"]

    try:
        r = run_benchmark(cfg, shape=(375, 1242), batch=16, iters=20)
        rec("sweeprows/1_fps", r["value"])
        for rows in (2, 4):
            sp.SWEEP_ROWS = rows
            jax.clear_caches()
            r = run_benchmark(cfg, shape=(375, 1242), batch=16, iters=20)
            rec(f"sweeprows/{rows}_fps", r["value"])
        sp.SWEEP_ROWS = 0
        jax.clear_caches()
    except Exception as e:
        sp.SWEEP_ROWS = 0
        rec("error/ab", repr(e)[:400]); traceback.print_exc()

    # exactness canary at R=2 vs CPU refs (only meaningful if it wins)
    try:
        d = np.load("/tmp/r55_refs/kitti4.npz")
        sp.SWEEP_ROWS = 2
        jax.clear_caches()
        out = np.asarray(sgbm(jnp.asarray(d["L0"]), jnp.asarray(d["R0"]),
                              cfg.replace(frames_per_step=1)))
        want = d["out0"]
        both = (out >= 0) & (want >= 0)
        rec("exact/r2_mismatch", int(((out >= 0) != (want >= 0)).sum()))
        rec("exact/r2_max_abs",
            float(np.abs(out - want)[both].max()) if both.any() else 0.0)
        sp.SWEEP_ROWS = 0
        jax.clear_caches()
    except Exception as e:
        sp.SWEEP_ROWS = 0
        rec("error/exact", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
