"""Round-5 TPU batch #62: adaptive bwd-R A/B.

r59's BWD_ROWS A/B (R=8 adopted, +0.24 at the headline) ran non-adaptive
only; the adaptive point inherited R=8 untested, and r61's adaptive
canary read 70.46 vs the r53 record 70.76 (measured at bwd R=1). One
cheap A/B settles whether that delta is run noise or a real
adaptive-bwd-R=8 loss: the adaptive bwd is the SWAR recurrence with
field-packed per-row P2' (lane-major), whose per-column map extraction
is extra per-step work the non-adaptive A/B never saw.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RESULTS = "scripts/tpu_r62_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v, "t": round(time.time() - T0, 1)}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

T0 = time.time()


def main():
    import tpustereo
    tpustereo.enable_compilation_cache()
    import jax
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.kernels import sgm_pallas as sp
    rec("device", str(jax.devices()[0].device_kind))
    cfg_a = PRESETS["kitti_sgm8"].replace(adaptive_p2=True)
    try:
        for rows in (8, 1, 8):      # 8 first (cache-hot from r61), then 1,
            sp.BWD_ROWS = rows      # then 8 again to bound run drift
            jax.clear_caches()
            r = run_benchmark(cfg_a, shape=(375, 1242), batch=16, iters=20)
            key = f"ap2/F4_fps_bwdR{rows}"
            rec(key if key not in results else key + "_rerun", r["value"])
    except Exception as e:
        rec("error/ab", repr(e)[:400]); traceback.print_exc()
    finally:
        sp.BWD_ROWS = 8
    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
