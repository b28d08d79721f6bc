"""Round-2 TPU batch #26: unstable-sort speckle A/B (stability is
semantically irrelevant in component_big/_sizes; XLA may sort cheaper)."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r26_results.json"
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
    from tpustereo.pipeline.sgbm import sgbm_frames
    kitti = PRESETS["kitti_sgm8"]
    try:
        r4 = np.load(f"{REFS}/kitti4.npz")
        Ls = jnp.asarray(np.stack([r4[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([r4[f"R{f}"] for f in range(4)]))
        outs_ref = np.stack([r4[f"out{f}"] for f in range(4)])
        got = np.asarray(sgbm_frames(Ls, Rs, kitti)).astype(np.float64)
        d = np.abs(got - outs_ref)
        rec("exact/kitti_F4_unstable_vs_cpu",
            {"max_abs": float(d.max()), "n_mismatch": int((d > 1e-4).sum())})
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_unstable_sort",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    except Exception as e:
        rec("error/kitti", repr(e)[:400]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
