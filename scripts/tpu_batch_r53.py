"""Round-5 TPU batch #53: lane-major adaptive-P2 maps on chip.

The (T, N, K) map operands force a 128-lane-padded Pallas layout (~42x
the real bytes written + streamed — the r52 composition residual).
Lane-major packs each direction's map as (T//128, N, 128) with the scan
row on the LANE axis (dense, fetched once per 128 rows, per-row column
extracted by an exact one-hot MXU dot), and hands the bwd recurrence a
plain (N, 1) P2' column — so adaptive configs now ride the SWAR bwd too.

1. Exactness vs CPU refs (new Mosaic surface: one-hot dots in the sweep
   kernels + SWAR bwd with field-packed per-row P2'): adaptive single +
   F=4 stacked.
2. fps: adaptive F=4 lane-major vs stacked control (cached from r49/51).
3. Standalone attribution: vertical sweep + bwd with lane-major maps vs
   the r51/r52 stacked/v32 readings.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r53_results.json"
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
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.kernels import sgm_pallas as sp
    from tpustereo.kernels.sgm_pallas import sgm_sweep, sweep_bwd_wta
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)
    cfg = PRESETS["kitti_sgm8"]
    cfg_a = cfg.replace(adaptive_p2=True)

    # 1) exactness (lane-major default ON at HEAD) ----------------------
    try:
        d = np.load("/tmp/r48_refs/kitti4_ap2.npz")
        out = np.asarray(sgbm(jnp.asarray(d["L0"]), jnp.asarray(d["R0"]),
                              cfg_a.replace(frames_per_step=1)))
        want = d["out0"]
        both = (out >= 0) & (want >= 0)
        rec("exact/lm_single_mismatch",
            int(((out >= 0) != (want >= 0)).sum()))
        rec("exact/lm_single_max_abs",
            float(np.abs(out - want)[both].max()) if both.any() else 0.0)
        Ls = jnp.asarray(np.stack([d[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([d[f"R{f}"] for f in range(4)]))
        outs = np.asarray(sgbm_frames(Ls, Rs, cfg_a))
        wants = np.stack([d[f"out{f}"] for f in range(4)])
        both = (outs >= 0) & (wants >= 0)
        rec("exact/lm_F4_mismatch",
            int(((outs >= 0) != (wants >= 0)).sum()))
        rec("exact/lm_F4_max_abs",
            float(np.abs(outs - wants)[both].max()) if both.any() else 0.0)
    except Exception as e:
        rec("error/exact", repr(e)[:400]); traceback.print_exc()

    # 2) fps A/B --------------------------------------------------------
    try:
        r = run_benchmark(cfg_a, shape=(375, 1242), batch=16, iters=20)
        rec("ap2/lanemajor_F4_fps", r["value"])
        sp.P2_LANE_MAJOR = False
        jax.clear_caches()
        r = run_benchmark(cfg_a, shape=(375, 1242), batch=16, iters=20)
        rec("ap2/stacked_F4_fps_control", r["value"])
        sp.P2_LANE_MAJOR = True
        jax.clear_caches()
    except Exception as e:
        sp.P2_LANE_MAJOR = True
        rec("error/ab", repr(e)[:400]); traceback.print_exc()

    # 3) standalone attribution -----------------------------------------
    try:
        F, H, W, D = 4, 375, 1242, 128
        Hp, Wq = 376, 1280
        C = jnp.asarray(rng.integers(0, 25, (F * Hp, Wq, D)).astype(np.int8))
        P2M = jnp.asarray(rng.integers(11, 121,
                                       (F * Hp, Wq, 3)).astype(np.int32))
        s = _timed_device_loop(
            lambda c, m: sgm_sweep(c, None, (0, 1, -1), False, p1=cfg.p1,
                                   p2=cfg.p2, n_real=W, d_real=D, frames=F,
                                   p2_maps=m, c_max=cfg.max_census_cost),
            C, P2M, iters=10) / F * 1e3
        rec("sweepdiag/lanemajor_ms_per_frame", round(s, 3))
        Ct = jnp.asarray(rng.integers(0, 25, (Wq, F * Hp, D)).astype(np.int8))
        St = jnp.asarray(rng.integers(0, 900,
                                      (Wq, F * Hp, D)).astype(np.int16))
        P2b = jnp.asarray(rng.integers(11, 121,
                                       (Wq, F * Hp, 1)).astype(np.int32))
        s = _timed_device_loop(
            lambda c, st, m: sweep_bwd_wta(c, st, cfg, w_real=W, d_real=D,
                                           p2_maps=m)[0],
            Ct, St, P2b, iters=10) / F * 1e3
        rec("bwd/lanemajor_swar_ms_per_frame", round(s, 3))
    except Exception as e:
        rec("error/diag", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
