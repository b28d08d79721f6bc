"""Round-3 TPU batch #30g: verify the negative-AND-mask workaround fixes
the r30f diag+n_real miscompile, then re-gate the full pipeline + A/B."""
import json, os, subprocess, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r30g_results.json"
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
    from tpustereo.pipeline.sgbm import sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)

    def ab(name, T, N, dxs, n_real, reverse=False):
        try:
            C = jnp.asarray(rng.integers(0, 25, (T, N, 128)).astype(np.int8))
            sp.SWEEP_SWAR = True; jax.clear_caches()
            on = np.asarray(sp.sgm_sweep(C, None, dxs, reverse, p1=10, p2=120, n_real=n_real, d_real=128))
            sp.SWEEP_SWAR = False; jax.clear_caches()
            off = np.asarray(sp.sgm_sweep(C, None, dxs, reverse, p1=10, p2=120, n_real=n_real, d_real=128))
            d = np.abs(on.astype(np.int64) - off.astype(np.int64))
            rec(f"ab/{name}", {"n_mismatch": int((d > 0).sum()), "max_abs": int(d.max())})
        except Exception as e:
            rec(f"error/{name}", repr(e)[:400]); traceback.print_exc()
        finally:
            sp.SWEEP_SWAR = True; jax.clear_caches()

    ab("dp1_nreal_fixed", 376, 1280, (1,), 1242)
    ab("three_nreal_fixed", 376, 1280, (0, 1, -1), 1242)
    ab("three_nreal_rev_fixed", 376, 1280, (0, 1, -1), 1242, reverse=True)

    # full-pipeline gates vs CPU refs
    REFS = "/tmp/r29_refs"
    refs = np.load(f"{REFS}/kitti4.npz")
    Ls = jnp.asarray(np.stack([refs[f"L{f}"] for f in range(4)]))
    Rs = jnp.asarray(np.stack([refs[f"R{f}"] for f in range(4)]))
    outs_ref = np.stack([refs[f"out{f}"] for f in range(4)])
    try:
        got = np.asarray(sgbm_frames(Ls, Rs, PRESETS["kitti_sgm8"])).astype(np.float64)
        d = np.abs(got - outs_ref)
        rec("exact/kitti_F4_swar_fixed", {"max_abs": float(d.max()), "n_mismatch": int((d > 1e-4).sum())})
        r = np.load(f"{REFS}/small.npz") if os.path.exists(f"{REFS}/small.npz") else None
        if r is None:
            subprocess.run([sys.executable, "scripts/cpu_refs_helper.py", f"{REFS}/small.npz", "small"], check=True, timeout=1800)
            r = np.load(f"{REFS}/small.npz")
        from tpustereo.pipeline.sgbm import sgbm
        got1 = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                               PRESETS["kitti_sgm8"].replace(frames_per_step=1))).astype(np.float64)
        d1 = np.abs(got1 - r["out"])
        rec("exact/small_F1_swar_fixed", {"max_abs": float(d1.max()), "n_mismatch": int((d1 > 1e-4).sum())})
        rb = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_SWAR_fixed", {k: rb[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    except Exception as e:
        rec("error/pipeline", repr(e)[:400]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
