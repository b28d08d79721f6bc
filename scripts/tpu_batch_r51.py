"""Round-5 TPU batch #51: adaptive-P2 map-layout A/B (SPLIT_P2) +
standalone sweep attribution for the r49 adaptive core gap
(15.05 vs 9.86 ms).

1. Standalone vertical 3-direction sweep at KITTI F=4 shapes:
   no-p2 control vs stacked (T,N,K) maps vs split K x (T,N,1) maps —
   names the per-row lane-slice cost directly.
2. Full adaptive F=4 pipeline: SPLIT_P2=True vs False (False == the r49
   program, cache-warm control).
3. Exactness: adaptive single + F=4 vs CPU refs with SPLIT_P2=True.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r51_results.json"
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
    from tpustereo.kernels.sgm_pallas import sgm_sweep
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)
    cfg = PRESETS["kitti_sgm8"]
    cfg_a = cfg.replace(adaptive_p2=True)

    # 1) standalone vertical sweep attribution --------------------------
    try:
        F, H, W, D = 4, 375, 1242, 128
        Hp, Wq = 376, 1280
        C = jnp.asarray(rng.integers(0, 25, (F * Hp, Wq, D)).astype(np.int8))
        P2M = jnp.asarray(rng.integers(11, 121,
                                       (F * Hp, Wq, 3)).astype(np.int32))

        def t(fn, *args):
            return _timed_device_loop(fn, *args, iters=10) / F * 1e3

        s = t(lambda c: sgm_sweep(c, None, (0, 1, -1), False, p1=cfg.p1,
                                  p2=cfg.p2, n_real=W, d_real=D, frames=F,
                                  c_max=cfg.max_census_cost), C)
        rec("sweepdiag/no_p2_ms_per_frame", round(s, 3))
        for split in (False, True):
            sp.SPLIT_P2 = split
            jax.clear_caches()
            s = t(lambda c, m: sgm_sweep(c, None, (0, 1, -1), False,
                                         p1=cfg.p1, p2=cfg.p2, n_real=W,
                                         d_real=D, frames=F, p2_maps=m,
                                         c_max=cfg.max_census_cost), C, P2M)
            rec(f"sweepdiag/{'split' if split else 'stacked'}_ms_per_frame",
                round(s, 3))
        sp.SPLIT_P2 = True
        jax.clear_caches()
    except Exception as e:
        sp.SPLIT_P2 = True
        rec("error/sweepdiag", repr(e)[:400]); traceback.print_exc()

    # 2) full adaptive pipeline A/B -------------------------------------
    try:
        for split in (True, False):
            sp.SPLIT_P2 = split
            jax.clear_caches()
            r = run_benchmark(cfg_a, shape=(375, 1242), batch=16, iters=20)
            rec(f"ap2/{'split' if split else 'stacked'}_F4_fps", r["value"])
        sp.SPLIT_P2 = True
        jax.clear_caches()
    except Exception as e:
        sp.SPLIT_P2 = True
        rec("error/ap2ab", repr(e)[:400]); traceback.print_exc()

    # 3) exactness with SPLIT_P2=True -----------------------------------
    try:
        d = np.load("/tmp/r48_refs/kitti4_ap2.npz")
        out = np.asarray(sgbm(jnp.asarray(d["L0"]), jnp.asarray(d["R0"]),
                              cfg_a.replace(frames_per_step=1)))
        want = d["out0"]
        both = (out >= 0) & (want >= 0)
        rec("exact/split_single_mismatch",
            int(((out >= 0) != (want >= 0)).sum()))
        rec("exact/split_single_max_abs",
            float(np.abs(out - want)[both].max()) if both.any() else 0.0)
        Ls = jnp.asarray(np.stack([d[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([d[f"R{f}"] for f in range(4)]))
        outs = np.asarray(sgbm_frames(Ls, Rs, cfg_a))
        wants = np.stack([d[f"out{f}"] for f in range(4)])
        both = (outs >= 0) & (wants >= 0)
        rec("exact/split_F4_mismatch",
            int(((outs >= 0) != (wants >= 0)).sum()))
        rec("exact/split_F4_max_abs",
            float(np.abs(outs - wants)[both].max()) if both.any() else 0.0)
    except Exception as e:
        rec("error/exact", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
