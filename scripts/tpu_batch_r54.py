"""Round-5 TPU batch #54 (final canaries): the kernel-signature refactor
(lane-major plumbing) recompiled every sweep program — re-canary the
non-headline operating points and complete the adaptive record.

1. Adaptive F=4 stages at the 70.8-fps lane-major operating point
   (closes the attribution ledger with a measurement, not arithmetic).
2. D=256 F=2 canary; sgm4 canary; odometry fused canary.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r54_results.json"
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
    from tpustereo.eval.bench import (production_stage_times, run_benchmark,
                                      run_odometry_benchmark)
    rec("device", str(jax.devices()[0].device_kind))
    cfg = PRESETS["kitti_sgm8"]

    try:
        from tpustereo.data.synthetic import synthetic_pair
        L, R, _, _ = synthetic_pair((375, 1242), disparity=40.0,
                                    slope=0.02, seed=0)
        lefts = jnp.asarray(np.stack([L] * 16))
        rights = jnp.asarray(np.stack([R] * 16))
        st = production_stage_times(cfg.replace(adaptive_p2=True),
                                    lefts, rights, iters=20)
        rec("ap2lm/stage_ms", st)
    except Exception as e:
        rec("error/ap2_stages", repr(e)[:400]); traceback.print_exc()

    for name, c, shape, batch, iters in (
            ("d256_f2", cfg.replace(num_disparities=256,
                                    frames_per_step=2), (375, 1242), 8, 10),
            ("sgm4", PRESETS["middlebury_sgm4"], (375, 1242), 16, 20)):
        try:
            r = run_benchmark(c, shape=shape, batch=batch, iters=iters)
            rec(f"canary/{name}_fps", r["value"])
        except Exception as e:
            rec(f"error/{name}", repr(e)[:400]); traceback.print_exc()

    try:
        r = run_odometry_benchmark(PRESETS["kitti_odometry"],
                                   shape=(375, 1242), frames=4, iters=10)
        rec("canary/odometry_fused_fps", r["value"])
    except Exception as e:
        rec("error/odo", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
