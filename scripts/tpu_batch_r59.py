"""Round-5 TPU batch #59: BWD_ROWS re-A/B at the SWEEP_ROWS=4 baseline
(the r47 wash was measured at sweeps-R=1; R interactions can be real)."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open("scripts/tpu_r59_results.json", "w"), indent=1)

def main():
    import tpustereo
    tpustereo.enable_compilation_cache()
    import jax
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.kernels import sgm_pallas as sp
    cfg = PRESETS["kitti_sgm8"]
    try:
        r = run_benchmark(cfg, shape=(375, 1242), batch=16, iters=20)
        rec("bwdrows1_fps", r["value"])
        for rows in (8, 32):
            sp.BWD_ROWS = rows
            jax.clear_caches()
            r = run_benchmark(cfg, shape=(375, 1242), batch=16, iters=20)
            rec(f"bwdrows{rows}_fps", r["value"])
        sp.BWD_ROWS = 1
        jax.clear_caches()
    except Exception as e:
        sp.BWD_ROWS = 1
        rec("error", repr(e)[:400]); traceback.print_exc()

if __name__ == "__main__":
    main()
