"""Round-3 TPU batch #34: bwd+WTA SWAR gate — on-chip exactness at every
geometry + headline A/B + core split update."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r34_results.json"
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
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)
    # 1. bwd kernel swar-vs-v32 on chip at production shape
    try:
        Ct = jnp.asarray(rng.integers(0, 25, (1280, 1504, 128)).astype(np.int8))
        St = jnp.asarray(rng.integers(0, 500, (1280, 1504, 128)).astype(np.int16))
        cfg = PRESETS["kitti_sgm8"]
        outs = {}
        secs = {}
        for flag in (True, False):
            sp.SWEEP_SWAR = flag; jax.clear_caches()
            outs[flag] = [np.asarray(v) for v in
                          sp.sweep_bwd_wta(Ct, St, cfg, w_real=1242, d_real=128)]
            secs[flag] = _timed_device_loop(
                lambda c, s: sp.sweep_bwd_wta(c, s, cfg, w_real=1242, d_real=128)[0],
                Ct, St, iters=10)
        sp.SWEEP_SWAR = True; jax.clear_caches()
        mism = sum(int((a != b).sum()) for a, b in zip(outs[True], outs[False]))
        rec("bwd/exact_vs_v32chip", {"n_mismatch": mism})
        rec("bwd/ms_per_frame", {"swar": round(secs[True] / 4 * 1e3, 3),
                                 "v32": round(secs[False] / 4 * 1e3, 3)})
    except Exception as e:
        rec("error/bwd", repr(e)[:400]); traceback.print_exc()
        sp.SWEEP_SWAR = True; jax.clear_caches()
    # 2. pipeline exactness vs CPU refs (F=4 and F=1)
    try:
        refs = np.load("/tmp/r29_refs/kitti4.npz")
        Ls = jnp.asarray(np.stack([refs[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([refs[f"R{f}"] for f in range(4)]))
        outs_ref = np.stack([refs[f"out{f}"] for f in range(4)])
        got = np.asarray(sgbm_frames(Ls, Rs, PRESETS["kitti_sgm8"])).astype(np.float64)
        d = np.abs(got - outs_ref)
        rec("exact/kitti_F4", {"max_abs": float(d.max()), "n_mismatch": int((d > 1e-4).sum())})
        r1 = np.load("/tmp/r29_refs/small.npz")
        got1 = np.asarray(sgbm(jnp.asarray(r1["L"]), jnp.asarray(r1["R"]),
                               PRESETS["kitti_sgm8"].replace(frames_per_step=1))).astype(np.float64)
        d1 = np.abs(got1 - r1["out"])
        rec("exact/small_F1", {"max_abs": float(d1.max()), "n_mismatch": int((d1 > 1e-4).sum())})
        rmh = np.load("/tmp/r29_refs/midhalf.npz")
        gmh = np.asarray(sgbm(jnp.asarray(rmh["L"]), jnp.asarray(rmh["R"]),
                              PRESETS["middlebury_sgm4"])).astype(np.float64)
        dmh = np.abs(gmh - rmh["out"])
        rec("exact/midhalf", {"max_abs": float(dmh.max()), "n_mismatch": int((dmh > 1e-4).sum())})
    except Exception as e:
        rec("error/exact", repr(e)[:400]); traceback.print_exc()
    # 3. headline
    try:
        r = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_bwdswar", {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    except Exception as e:
        rec("error/headline", repr(e)[:400]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
