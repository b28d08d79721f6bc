"""Round-5 TPU batch #61: ADAPTIVE_SWEEP_ROWS — lift the lane-major R=1 pin.

Any R dividing 128 keeps a fattened step's rows inside ONE lane-major map
block (the invariant the bwd kernel's RMW output blocks already rely on
at BWD_ROWS=8), so the r56 sweep R-inversion win (+1.3% at the
non-adaptive headline) may transfer to the adaptive operating point.
Also re-canaries adaptive at today's BWD_ROWS=8 default (the r53 70.8
record predates r59/60) and the non-adaptive headline (the dispatch
refactor touched the shared selection path — same resolved R, cache-hot).

1. adaptive kitti8 F=4 fps at ADAPTIVE_SWEEP_ROWS = 1 (default) / 2 / 4.
2. Exactness at the fps-winning R (adaptive single + F=4 stacked vs CPU
   refs from cpu_refs_helper kitti4_ap2).
3. Non-adaptive headline canary.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r61_results.json"
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
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.kernels import sgm_pallas as sp
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    cfg = PRESETS["kitti_sgm8"]
    cfg_a = cfg.replace(adaptive_p2=True)

    # 1) adaptive fps A/B over ADAPTIVE_SWEEP_ROWS -----------------------
    fps = {}
    try:
        assert sp.ADAPTIVE_SWEEP_ROWS == 1    # shipped default = baseline
        for rows in (1, 2, 4):
            sp.ADAPTIVE_SWEEP_ROWS = rows
            jax.clear_caches()
            r = run_benchmark(cfg_a, shape=(375, 1242), batch=16, iters=20)
            fps[rows] = r["value"]
            rec(f"ap2/F4_fps_R{rows}", r["value"])
    except Exception as e:
        rec("error/ab", repr(e)[:400]); traceback.print_exc()

    # 2) exactness at the fps-winning R ----------------------------------
    try:
        best = max(fps, key=fps.get) if fps else 4
        rec("ap2/best_R", best)
        sp.ADAPTIVE_SWEEP_ROWS = best
        jax.clear_caches()
        d = np.load("/tmp/r61_refs/kitti4_ap2.npz")
        out = np.asarray(sgbm(jnp.asarray(d["L0"]), jnp.asarray(d["R0"]),
                              cfg_a.replace(frames_per_step=1)))
        want = d["out0"]
        both = (out >= 0) & (want >= 0)
        rec("exact/single_mismatch", int(((out >= 0) != (want >= 0)).sum()))
        rec("exact/single_max_abs",
            float(np.abs(out - want)[both].max()) if both.any() else 0.0)
        Ls = jnp.asarray(np.stack([d[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([d[f"R{f}"] for f in range(4)]))
        outs = np.asarray(sgbm_frames(Ls, Rs, cfg_a))
        wants = np.stack([d[f"out{f}"] for f in range(4)])
        both = (outs >= 0) & (wants >= 0)
        rec("exact/F4_mismatch", int(((outs >= 0) != (wants >= 0)).sum()))
        rec("exact/F4_max_abs",
            float(np.abs(outs - wants)[both].max()) if both.any() else 0.0)
    except Exception as e:
        rec("error/exact", repr(e)[:400]); traceback.print_exc()
    finally:
        sp.ADAPTIVE_SWEEP_ROWS = 1
        jax.clear_caches()

    # 3) non-adaptive headline canary (cache-hot) ------------------------
    try:
        r = run_benchmark(cfg, shape=(375, 1242), batch=16, iters=20)
        rec("headline/kitti8_F4_fps", r["value"])
    except Exception as e:
        rec("error/headline", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
