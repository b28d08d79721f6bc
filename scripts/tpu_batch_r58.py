"""Round-5 TPU batch #58: midfull (1500x3000) canary at the final
SWEEP_ROWS=4 default (the one sweep-bearing row not re-canaried in r57)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import tpustereo
    tpustereo.enable_compilation_cache()
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    t0 = time.time()
    r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(1500, 3000),
                      batch=4, iters=3)
    print(json.dumps({"midfull_fps": r["value"],
                      "midfull_ms": r["ms_per_frame"],
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    json.dump({"midfull_fps": r["value"], "midfull_ms": r["ms_per_frame"]},
              open("scripts/tpu_r58_results.json", "w"), indent=1)

if __name__ == "__main__":
    main()
