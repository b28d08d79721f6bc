"""Round-2 TPU batch #28: on-chip exactness for the two presets whose
kernels changed since their last on-chip verification (wta_lr_pallas
gained the MXU one-hot refinement): tsukuba_sad and
middlebury_census_wta, vs CPU references."""
import json, os, subprocess, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r28_results.json"
REFS = "/tmp/r20_refs"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    for case in ("tsukuba", "census_wta"):
        path = f"{REFS}/{case}.npz"
        if not os.path.exists(path):
            subprocess.run([sys.executable, "scripts/cpu_refs_helper.py",
                            path, case], check=True)
    import jax, jax.numpy as jnp
    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))
    from tpustereo.config import PRESETS
    from tpustereo.pipeline.sgbm import sgbm
    for case, preset in (("tsukuba", "tsukuba_sad"),
                         ("census_wta", "middlebury_census_wta")):
        try:
            r = np.load(f"{REFS}/{case}.npz")
            got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                                  PRESETS[preset])).astype(np.float64)
            d = np.abs(got - r["out"])
            rec(f"exact/{preset}_vs_cpu",
                {"max_abs": float(d.max()),
                 "n_mismatch": int((d > 1e-4).sum()), "n_px": int(d.size)})
        except Exception as e:
            rec(f"error/{case}", repr(e)[:400]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
