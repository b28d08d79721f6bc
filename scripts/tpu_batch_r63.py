"""Round-5 TPU batch #63: chip-gate the kept non-default
ADAPTIVE_SWEEP_ROWS surfaces (r61 measured their fps on chip but gated
exactness only at the shipped R=1; SPLIT_P2 precedent gates kept
toggles on chip). Adaptive single + F=4 stacked vs CPU refs at R=4
(internally clamped to the VMEM-feasible R per sweep — the same
programs the r61 fps leg compiled)."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r63_results.json"
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
    from tpustereo.kernels import sgm_pallas as sp
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    cfg_a = PRESETS["kitti_sgm8"].replace(adaptive_p2=True)
    try:
        sp.ADAPTIVE_SWEEP_ROWS = 4
        jax.clear_caches()
        d = np.load("/tmp/r61_refs/kitti4_ap2.npz")
        out = np.asarray(sgbm(jnp.asarray(d["L0"]), jnp.asarray(d["R0"]),
                              cfg_a.replace(frames_per_step=1)))
        want = d["out0"]
        both = (out >= 0) & (want >= 0)
        rec("exact/R4_single_mismatch",
            int(((out >= 0) != (want >= 0)).sum()))
        rec("exact/R4_single_max_abs",
            float(np.abs(out - want)[both].max()) if both.any() else 0.0)
        Ls = jnp.asarray(np.stack([d[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([d[f"R{f}"] for f in range(4)]))
        outs = np.asarray(sgbm_frames(Ls, Rs, cfg_a))
        wants = np.stack([d[f"out{f}"] for f in range(4)])
        both = (outs >= 0) & (wants >= 0)
        rec("exact/R4_F4_mismatch", int(((outs >= 0) != (wants >= 0)).sum()))
        rec("exact/R4_F4_max_abs",
            float(np.abs(outs - wants)[both].max()) if both.any() else 0.0)
    except Exception as e:
        rec("error/exact", repr(e)[:400]); traceback.print_exc()
    finally:
        sp.ADAPTIVE_SWEEP_ROWS = 1
        jax.clear_caches()
    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
