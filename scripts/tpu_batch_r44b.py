"""Round-4 TPU batch #44b: close the r44 gaps at HEAD.

- census97 exactness (r44 hit a transient compile-transport error).
- d512 exactness regate: the bf16 gate now bounds D <= 256 (r44 OOM), so
  D=512 dispatches the SWAR branch (r42-validated program).
- sgm4 at the PUBLISHED F=4 operating point (the preset now ships it):
  bf16 default vs SWAR control — the comparison r43c/d ran at F=1.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r44b_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm
    rec("device", str(jax.devices()[0].device_kind))
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)

    def gate(name, npz, cfg):
        r = np.load(npz)
        got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                              cfg)).astype(np.float64)
        d = np.abs(got - r["out"])
        rec(f"exact/{name}", {"max_abs": float(d.max()),
                              "n_mismatch": int((d > 1e-4).sum()),
                              "n_px": int(d.size)})

    for name, npz, cfg in (
            ("census97", "/tmp/r44_refs/census97.npz",
             k1.replace(census_window=(9, 7))),
            ("d512_swar", "/tmp/r42_refs/d512.npz",
             k1.replace(num_disparities=512))):
        try:
            gate(name, npz, cfg)
        except Exception as e:
            rec(f"error/{name}", repr(e)[:500]); traceback.print_exc()

    # sgm4 matrix: F in {4 (the published point, preset default), 1} x
    # {bf16 (HEAD default), SWAR control}, all in ONE process — the
    # F=1 numbers disagree wildly across batches (r43d/e ~89-90 vs r44
    # 100.5 for nominally identical code+flags), so re-pair them here
    # and re-run the first config at the end as a drift canary.
    runs = [("sgm4_f4_bf16", 4, True), ("sgm4_f4_swar", 4, False),
            ("sgm4_f1_bf16", 1, True), ("sgm4_f1_swar", 1, False),
            ("sgm4_f4_bf16_again", 4, True)]
    for name, F, bf in runs:
        try:
            sp.SWEEP_BF16 = bf
            jax.clear_caches()
            cfg = PRESETS["middlebury_sgm4"].replace(frames_per_step=F)
            r = run_benchmark(cfg, shape=(375, 1242), batch=8, iters=20)
            rec(f"bench/{name}", {k: r[k] for k in
                                  ("value", "ms_per_frame")})
        except Exception as e:
            rec(f"error/{name}", repr(e)[:500]); traceback.print_exc()
        finally:
            sp.SWEEP_BF16 = True
            jax.clear_caches()

    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
