"""Round-2 TPU batch #25: true-Middlebury full-res, now compilable.

After the two midfull fixes (fused-Ct width gate; Hillis-Steele scans
beyond 2M elements): compile-time probes, then exactness vs the CPU
reference and the bench number for BASELINE.md. Also re-verifies KITTI
exactness + headline (the postproc module changed: the <=2M gate keeps
the KITTI program on associative_scan, so its programs should hit cache).
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r25_results.json"
REFS = "/tmp/r20_refs"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def exact(key, got, want, tol=1e-4):
    got = np.asarray(got, np.float64); want = np.asarray(want, np.float64)
    d = np.abs(got - want)
    rec(key, {"max_abs": float(d.max()), "n_mismatch": int((d > tol).sum()),
              "n_px": int(got.size)})

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    cfg_h = PRESETS["middlebury_sgm4"]
    kitti = PRESETS["kitti_sgm8"]

    # 1. compile-probe component_big at 4.5M with the H-S scans
    try:
        from tpustereo.ops.postproc import component_big
        rng = np.random.default_rng(0)
        lab = jnp.asarray(rng.integers(0, 4500000, (1500, 3000),
                                       dtype=np.int32))
        t = time.time()
        jax.jit(lambda l: component_big(l, 100))(lab).block_until_ready()
        rec("compile_s/component_big_4p5M_HS", round(time.time() - t, 1))
    except Exception as e:
        rec("error/cb", repr(e)[:300]); traceback.print_exc()

    # 2. midfull pipeline: exactness + bench
    try:
        rf = np.load(f"{REFS}/midfull.npz")
        t = time.time()
        out = np.asarray(sgbm(jnp.asarray(rf["L"]), jnp.asarray(rf["R"]),
                              cfg_h))
        rec("compile_s/midfull_pipeline", round(time.time() - t, 1))
        exact("exact/midfull_vs_cpu", out, rf["out"])
        r = run_benchmark(cfg_h, shape=(1500, 3000), batch=2, iters=5)
        rec("bench/middlebury_full_1500x3000",
            {k: r[k] for k in ("value", "ms_per_frame")})
    except Exception as e:
        rec("error/midfull", repr(e)[:400]); traceback.print_exc()

    # 3. KITTI re-verify (should be cache hits)
    try:
        r4 = np.load(f"{REFS}/kitti4.npz")
        Ls = jnp.asarray(np.stack([r4[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([r4[f"R{f}"] for f in range(4)]))
        outs_ref = np.stack([r4[f"out{f}"] for f in range(4)])
        exact("exact/kitti_F4_vs_cpu", np.asarray(sgbm_frames(Ls, Rs, kitti)),
              outs_ref)
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_sgm8_F4_b16",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    except Exception as e:
        rec("error/kitti", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
