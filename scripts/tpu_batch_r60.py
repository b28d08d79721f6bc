"""Round-5 TPU batch #60 (final): BWD_ROWS=8 adoption — exactness canary
at the shipped defaults (kitti f0 + F=4 vs CPU refs) and the final
3-run headline."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open("scripts/tpu_r60_results.json", "w"), indent=1)

def main():
    import tpustereo
    tpustereo.enable_compilation_cache()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    cfg = PRESETS["kitti_sgm8"]
    try:
        d = np.load("/tmp/r55_refs/kitti4.npz")
        out = np.asarray(sgbm(jnp.asarray(d["L0"]), jnp.asarray(d["R0"]),
                              cfg.replace(frames_per_step=1)))
        want = d["out0"]
        both = (out >= 0) & (want >= 0)
        rec("exact_f0_mismatch", int(((out >= 0) != (want >= 0)).sum()))
        rec("exact_f0_max_abs",
            float(np.abs(out - want)[both].max()) if both.any() else 0.0)
        Ls = jnp.asarray(np.stack([d[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([d[f"R{f}"] for f in range(4)]))
        outs = np.asarray(sgbm_frames(Ls, Rs, cfg))
        wants = np.stack([d[f"out{f}"] for f in range(4)])
        both = (outs >= 0) & (wants >= 0)
        rec("exact_F4_mismatch", int(((outs >= 0) != (wants >= 0)).sum()))
        rec("exact_F4_max_abs",
            float(np.abs(outs - wants)[both].max()) if both.any() else 0.0)
    except Exception as e:
        rec("error_exact", repr(e)[:400]); traceback.print_exc()
    try:
        vals = sorted(run_benchmark(cfg, shape=(375, 1242), batch=16,
                                    iters=20)["value"] for _ in range(3))
        rec("headline_3run", vals)
        rec("headline_mean", round(sum(vals) / 3, 3))
    except Exception as e:
        rec("error_headline", repr(e)[:400]); traceback.print_exc()

if __name__ == "__main__":
    main()
