"""Round-4 TPU batch #40:
1. On-chip exactness gates for the NEW capability surface (min_disparity
   > 0 and D = 256 through the fused kernels) vs CPU-computed references.
2. Bidirectional vertical sweep A/B (BIDIR_VERT): exactness at small +
   KITTI, then headline/sgm4 bench with the toggle on vs HEAD default.
3. Headline bookkeeping: 3 consecutive headline runs at HEAD defaults
   (VERDICT r3 weak #2 — quote mean +- spread, not a single best read).
"""
import json, os, subprocess, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r40_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

REFS = "/tmp/r40_refs"

def ensure_refs():
    os.makedirs(REFS, exist_ok=True)
    for case in ("mindisp", "d256"):
        path = f"{REFS}/{case}.npz"
        if not os.path.exists(path):
            t = time.time()
            subprocess.run([sys.executable, "scripts/cpu_refs_helper.py",
                            path, case], check=True)
            rec(f"refs/{case}_s", round(time.time() - t, 1))

def gate(name, ref_npz, cfg, sgbm, jnp, tol=1e-4):
    r = np.load(ref_npz)
    got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                          cfg)).astype(np.float64)
    d = np.abs(got - r["out"])
    rec(f"exact/{name}", {"max_abs": float(d.max()),
                          "n_mismatch": int((d > tol).sum()),
                          "n_px": int(d.size)})

def main():
    t0 = time.time()
    ensure_refs()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm
    import tpustereo.kernels.sgm_pallas as sp
    rec("device", str(jax.devices()[0].device_kind))
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)

    # -- 1. new-surface exactness gates (HEAD defaults) ------------------
    try:
        gate("mindisp_375x1242", f"{REFS}/mindisp.npz",
             k1.replace(min_disparity=16), sgbm, jnp)
    except Exception as e:
        rec("error/mindisp", repr(e)[:500]); traceback.print_exc()
    try:
        gate("d256_375x1242", f"{REFS}/d256.npz",
             k1.replace(num_disparities=256), sgbm, jnp)
    except Exception as e:
        rec("error/d256", repr(e)[:500]); traceback.print_exc()
    # HEAD canary after the r4 _dir_step refactor (small case, fast)
    try:
        gate("head_canary_small", "/tmp/r29_refs/small.npz", k1, sgbm, jnp)
    except Exception as e:
        rec("error/canary", repr(e)[:500]); traceback.print_exc()

    # -- 2a. headline 3x at HEAD defaults ---------------------------------
    cfg4 = PRESETS["kitti_sgm8"]
    for i in range(3):
        try:
            r = run_benchmark(cfg4, shape=(375, 1242), batch=16, iters=20)
            rec(f"bench/headline_run{i}",
                {k: r[k] for k in ("value", "ms_per_frame")})
        except Exception as e:
            rec(f"error/headline{i}", repr(e)[:500]); traceback.print_exc()

    # -- 2b. BIDIR_VERT A/B ------------------------------------------------
    try:
        sp.BIDIR_VERT = True
        jax.clear_caches()
        gate("bidir_small", "/tmp/r29_refs/small.npz", k1, sgbm, jnp)
        r = np.load("/tmp/r29_refs/kitti4.npz")
        got = np.asarray(sgbm(jnp.asarray(r["L0"]), jnp.asarray(r["R0"]),
                              k1)).astype(np.float64)
        d = np.abs(got - r["out0"])
        rec("exact/bidir_kitti_f0", {"max_abs": float(d.max()),
                                     "n_mismatch": int((d > 1e-4).sum())})
        for i in range(2):
            r2 = run_benchmark(cfg4, shape=(375, 1242), batch=16, iters=20)
            rec(f"bench/headline_bidir_run{i}",
                {k: r2[k] for k in ("value", "ms_per_frame")})
        # 4-path: K=1 vertical sweeps -> the ILP doubling is largest here
        r2 = run_benchmark(PRESETS["middlebury_sgm4"].replace(
            frames_per_step=4), shape=(375, 1242), batch=8, iters=20)
        rec("bench/sgm4_bidir", {k: r2[k] for k in ("value",
                                                    "ms_per_frame")})
    except Exception as e:
        rec("error/bidir", repr(e)[:500]); traceback.print_exc()
    finally:
        sp.BIDIR_VERT = False
        jax.clear_caches()
    try:
        r = run_benchmark(PRESETS["middlebury_sgm4"].replace(
            frames_per_step=4), shape=(375, 1242), batch=8, iters=20)
        rec("bench/sgm4_default", {k: r[k] for k in ("value",
                                                     "ms_per_frame")})
    except Exception as e:
        rec("error/sgm4_default", repr(e)[:500]); traceback.print_exc()

    # -- 3. new-surface throughput records --------------------------------
    # D=256 KITTI (F=1: the F=4 bwd stack is VMEM-gated at D=256);
    # min_disparity=16 headline-config sanity (should match the headline)
    try:
        r = run_benchmark(k1.replace(num_disparities=256, batch_size=8),
                          shape=(375, 1242), batch=8, iters=20)
        rec("bench/kitti_d256_f1", {k: r[k] for k in ("value",
                                                      "ms_per_frame")})
    except Exception as e:
        rec("error/d256_bench", repr(e)[:500]); traceback.print_exc()
    try:
        r = run_benchmark(cfg4.replace(min_disparity=16), shape=(375, 1242),
                          batch=16, iters=20)
        rec("bench/kitti_mindisp16_f4",
            {k: r[k] for k in ("value", "ms_per_frame")})
    except Exception as e:
        rec("error/mindisp_bench", repr(e)[:500]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
