"""Round-5 TPU batch #55: post-refactor exactness re-gate for the
NON-adaptive paths (the lane-major plumbing changed _sweep_kernel /
sweep_bwd_wta signatures for every config; r53/54 re-gated only the
adaptive surface; interpret cannot catch Mosaic bugs).

1. kitti f0 single + the F=4 stacked composition vs CPU refs (bf16
   sweeps + SWAR bwd — the headline path).
2. D=512 (SWAR sweeps, 4-lane-block WTA) exact + an fps canary.

Refs: /tmp/r55_refs/{kitti4,d512}.npz (scripts/run_r55.sh).
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r55_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v, "t": round(time.time() - T0, 1)}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

T0 = time.time()


def compare(name, got, want):
    got, want = np.asarray(got), np.asarray(want)
    vg, vw = got >= 0, want >= 0
    mism = int((vg != vw).sum())
    both = vg & vw
    maxab = float(np.abs(got - want)[both].max()) if both.any() else 0.0
    rec(f"{name}/valid_mismatches", mism)
    rec(f"{name}/float_max_abs", round(maxab, 9))


def main():
    import tpustereo
    tpustereo.enable_compilation_cache()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)

    try:
        d = np.load("/tmp/r55_refs/kitti4.npz")
        out = sgbm(jnp.asarray(d["L0"]), jnp.asarray(d["R0"]), k1)
        compare("exact/kitti_f0", out, d["out0"])
        Ls = jnp.asarray(np.stack([d[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([d[f"R{f}"] for f in range(4)]))
        outs = np.asarray(sgbm_frames(Ls, Rs, PRESETS["kitti_sgm8"]))
        wants = np.stack([d[f"out{f}"] for f in range(4)])
        compare("exact/kitti_F4", outs, wants)
    except Exception as e:
        rec("error/kitti", repr(e)[:400]); traceback.print_exc()

    try:
        d = np.load("/tmp/r55_refs/d512.npz")
        cfg = k1.replace(num_disparities=512)
        out = sgbm(jnp.asarray(d["L"]), jnp.asarray(d["R"]), cfg)
        compare("exact/d512", out, d["out"])
        r = run_benchmark(cfg, shape=(256, 960), batch=8, iters=10)
        rec("canary/d512_fps", r["value"])
    except Exception as e:
        rec("error/d512", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
