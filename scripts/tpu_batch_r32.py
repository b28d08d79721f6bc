"""Round-3 TPU batch #32: top_k corner selection A/B (replaces the
full-image argsort in detect_corners) on the fused odometry step, plus a
final headline confirmation at HEAD."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r32_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark, run_odometry_benchmark
    rec("device", str(jax.devices()[0].device_kind))
    try:
        r = run_odometry_benchmark(PRESETS["kitti_odometry"], shape=(375, 1242),
                                   frames=4, iters=10)
        rec("odometry/fused_step_topk", {k: r[k] for k in ("value", "ms_per_frame")})
    except Exception as e:
        rec("error/odometry", repr(e)[:400]); traceback.print_exc()
    try:
        # interactive smoke at HEAD (SWAR + top_k + batched closure)
        from tpustereo.data.synthetic import synthetic_sequence
        from tpustereo.odometry import StereoOdometry
        calib, frames, _ = synthetic_sequence(n_frames=6, shape=(375, 1242),
                                              depth=12.0, fx=718.0, baseline=0.54,
                                              step_x=0.08, slant=0.35, seed=3)
        odo = StereoOdometry(calib, PRESETS["kitti_odometry"].replace(strips=1))
        times = []
        for L, R in frames:
            t1 = time.time(); odo.step(L, R); times.append(time.time() - t1)
        rec("odometry/interactive_smoke_head",
            {"steady_ms_per_frame": round(float(np.mean(times[2:])) * 1e3, 1)})
    except Exception as e:
        rec("error/smoke", repr(e)[:400]); traceback.print_exc()
    try:
        r = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_final", {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    except Exception as e:
        rec("error/headline", repr(e)[:400]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
