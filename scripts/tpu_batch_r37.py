"""Round-3 TPU batch #37: cost-kernel probes — (a) int8 OOB mask block
(4x less per-step DMA), (b) _ROWS=8 fattened row blocks (halve per-step
overhead; may OOM scoped VMEM — a compile error is an answer too)."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r37_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    import tpustereo.kernels.cost_pallas as cp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    refs = np.load("/tmp/r29_refs/kitti4.npz")
    Ls = jnp.asarray(np.stack([refs[f"L{f}"] for f in range(4)]))
    Rs = jnp.asarray(np.stack([refs[f"R{f}"] for f in range(4)]))
    outs_ref = np.stack([refs[f"out{f}"] for f in range(4)])
    kitti = PRESETS["kitti_sgm8"]

    def gate(tag):
        got = np.asarray(sgbm_frames(Ls, Rs, kitti)).astype(np.float64)
        d = np.abs(got - outs_ref)
        rec(f"exact/{tag}", {"max_abs": float(d.max()), "n_mismatch": int((d > 1e-4).sum())})
        cost = lambda l, r: cp.census_cost_volume_pallas(l, r, 128, 24, (5, 5), padded=True, with_transposed=True)
        s = _timed_device_loop(cost, Ls, Rs, iters=10)
        rec(f"cost_ms_per_frame/{tag}", round(s / 4 * 1e3, 3))
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec(f"bench/{tag}", {k: r[k] for k in ("value", "ms_per_frame")})

    try:
        gate("oob_int8_R4")
    except Exception as e:
        rec("error/oob_int8", repr(e)[:400]); traceback.print_exc()
    try:
        cp._ROWS = 8
        jax.clear_caches()
        gate("oob_int8_R8")
    except Exception as e:
        rec("error/R8", repr(e)[:600]); traceback.print_exc()
    finally:
        cp._ROWS = 4
        jax.clear_caches()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
