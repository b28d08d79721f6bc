"""Round-4 TPU batch #43e: is today's sgm4 DEFAULT still 98.4?

r43d's combos don't compose additively (bwd-only bf16 'costs' sgm4
9 fps although it changes one kernel) — the likely explanation is that
the sgm4 default regressed between r40 (98.4, pre pack-shift) and HEAD:
r42 re-gated exactness after a32aeb8 but never re-benched sgm4. Measure
the default (both flags off) twice + stages, with a kitti8 control.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RESULTS = "scripts/tpu_r43e_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.config import PRESETS
    import tpustereo.kernels.sgm_pallas as sp
    rec("device", str(jax.devices()[0].device_kind))
    rec("flags", {"SWEEP_BF16": sp.SWEEP_BF16, "BWD_BF16": sp.BWD_BF16,
                  "SWEEP_SWAR": sp.SWEEP_SWAR})
    try:
        r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(375, 1242),
                          batch=8, iters=20, stages=True)
        rec("bench/sgm4_default_run0", {k: r[k] for k in
                                        ("value", "ms_per_frame")})
        rec("stages/sgm4", r["stage_ms"])
        r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(375, 1242),
                          batch=8, iters=20)
        rec("bench/sgm4_default_run1", {k: r[k] for k in
                                        ("value", "ms_per_frame")})
        r = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242),
                          batch=16, iters=20)
        rec("bench/kitti8_default_control", {k: r[k] for k in
                                             ("value", "ms_per_frame")})
    except Exception as e:
        rec("error", repr(e)[:500]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
