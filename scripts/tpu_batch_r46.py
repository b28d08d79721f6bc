"""Round-4 TPU batch #46: on-chip exactness for the bf16 + adaptive-P2
path (new compiled surface from 9713474 — the bf16 sweep branch now
takes per-direction P2 maps; interpret parity cannot catch Mosaic
miscompiles) + a HEAD canary after today's final commits.
"""
import json, os, subprocess, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r46_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    path = "/tmp/r46_refs/adaptive.npz"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        t = time.time()
        subprocess.run([sys.executable, "scripts/cpu_refs_helper.py",
                        path, "adaptive"], check=True)
        rec("refs/adaptive_s", round(time.time() - t, 1))
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.pipeline.sgbm import sgbm
    rec("device", str(jax.devices()[0].device_kind))
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)
    try:
        r = np.load(path)
        got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                              k1.replace(adaptive_p2=True))
                         ).astype(np.float64)
        d = np.abs(got - r["out"])
        rec("exact/adaptive_bf16", {"max_abs": float(d.max()),
                                    "n_mismatch": int((d > 1e-4).sum()),
                                    "n_px": int(d.size)})
    except Exception as e:
        rec("error/adaptive", repr(e)[:500]); traceback.print_exc()
    try:
        r = np.load("/tmp/r29_refs/small.npz")
        got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                              k1)).astype(np.float64)
        d = np.abs(got - r["out"])
        rec("exact/head_canary_small", {"max_abs": float(d.max()),
                                        "n_mismatch":
                                        int((d > 1e-4).sum())})
    except Exception as e:
        rec("error/canary", repr(e)[:500]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
