"""Round-3 TPU batch #36: post-refactor re-gate (the shared _swar_sgm_step
helper is code motion, but on-chip exactness must be re-proven after ANY
kernel-source change — interpret cannot catch Mosaic bugs)."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r36_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    try:
        refs = np.load("/tmp/r29_refs/kitti4.npz")
        Ls = jnp.asarray(np.stack([refs[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([refs[f"R{f}"] for f in range(4)]))
        outs_ref = np.stack([refs[f"out{f}"] for f in range(4)])
        got = np.asarray(sgbm_frames(Ls, Rs, PRESETS["kitti_sgm8"])).astype(np.float64)
        d = np.abs(got - outs_ref)
        rec("exact/kitti_F4_postrefactor", {"max_abs": float(d.max()), "n_mismatch": int((d > 1e-4).sum())})
        r = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_postrefactor", {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    except Exception as e:
        rec("error/gate", repr(e)[:400]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
