"""Round-5 TPU batch #50: final HEAD canaries for the remaining
operating points (config 2 census_wta + config 5 odometry fused/tiled),
so every BASELINE row carries a round-5 provenance."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RESULTS = "scripts/tpu_r50_results.json"
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
    from tpustereo.eval.bench import run_benchmark, run_odometry_benchmark
    rec("device", str(jax.devices()[0].device_kind))

    try:
        r = run_benchmark(PRESETS["middlebury_census_wta"],
                          shape=(375, 621), batch=16, iters=20)
        rec("census_wta/fps", r["value"])
        rec("census_wta/ms", r["ms_per_frame"])
    except Exception as e:
        rec("error/census_wta", repr(e)[:400]); traceback.print_exc()

    try:
        r = run_odometry_benchmark(PRESETS["kitti_odometry"],
                                   shape=(375, 1242), frames=4, iters=10)
        rec("odometry/fused_fps", r["value"])
    except Exception as e:
        rec("error/odo", repr(e)[:400]); traceback.print_exc()

    try:
        r = run_odometry_benchmark(PRESETS["kitti_odometry"],
                                   shape=(375, 1242), frames=4, iters=10,
                                   tiled=True)
        rec("odometry/tiled_fps", r["value"])
    except Exception as e:
        rec("error/odo_tiled", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
