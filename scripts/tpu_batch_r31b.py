"""Round-3 TPU batch #31b: settle the census_wta 482-vs-513 discrepancy
(mode has no SGM sweeps, so SWAR cannot explain it) - re-measure 3x each
way plus the r2-era b16 shape, all in one process."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RESULTS = "scripts/tpu_r31b_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    import jax
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    rec("device", str(jax.devices()[0].device_kind))
    cfg = PRESETS["middlebury_census_wta"]
    for i in range(3):
        r = run_benchmark(cfg, shape=(375, 621), batch=16, iters=20)
        rec(f"bench/census_wta_b16_run{i}", {k: r[k] for k in ("value", "ms_per_frame")})

if __name__ == "__main__":
    sys.exit(main())
