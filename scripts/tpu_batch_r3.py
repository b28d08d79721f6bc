"""Round-2 TPU batch #3: R=1 sweeps + Pallas LR check + decomposition.

Follow-up to tpu_batch_r2.py (results: fattening hurts — R1/R4/R8 =
6.40/6.64/6.88 ms on the K=3 vertical sweep; stage tables are boundary-tax
noise). This batch (a) re-validates exactness/bench with R=1 defaults and
the new dr_consistency_pallas, (b) measures horizontal-layout fattening and
transpose tile variants, (c) gets a TRUSTWORTHY in-context decomposition by
timing partial pipelines and differencing, (d) runs the true-Middlebury
geometry sections that the VMEM fix unblocks.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r3_results.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm

    def exactness(tag, cfg, shape, disparity=40.0):
        L, R, _, _ = synthetic_pair(shape, disparity=disparity, slope=0.02, seed=0)
        L, R = jnp.asarray(L), jnp.asarray(R)
        out_pal = np.asarray(sgbm(L, R, cfg))
        out_jnp = np.asarray(sgbm(L, R, cfg.replace(backend="jnp")))
        diff = np.abs(out_pal - out_jnp)
        rec(f"exact/{tag}", {
            "max_abs": float(diff.max()),
            "n_mismatch_1e5": int((diff > 1e-5).sum()),
            "n_px": int(diff.size),
        })

    kitti = PRESETS["kitti_sgm8"]

    # ---- 1. headline: exactness (new LR kernel) + bench -------------------
    exactness("kitti_sgm8", kitti, (375, 1242))
    r = run_benchmark(kitti, shape=(375, 1242), batch=2, iters=10)
    rec("bench/kitti_sgm8", {k: r[k] for k in
                             ("value", "ms_per_frame", "vs_baseline")})
    r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(375, 1242), batch=2,
                      iters=10)
    rec("bench/middlebury_sgm4", {k: r[k] for k in ("value", "ms_per_frame")})
    exactness("kitti_sgm8_adaptive_p2", kitti.replace(adaptive_p2=True),
              (375, 1242))

    # ---- 2. micros --------------------------------------------------------
    from tpustereo.kernels import dr_consistency_pallas, transpose_hw_pallas
    from tpustereo.kernels.sgm_pallas import sgm_sweep, sweep_bwd_wta, _round_up
    from tpustereo.ops.postproc import dr_consistency

    H, W, D = 375, 1242, 128
    Hp, Wq = _round_up(H, 8), _round_up(W, 128)
    rng = np.random.default_rng(0)

    # dr_consistency: jnp vs pallas
    d_r = jnp.asarray(rng.integers(0, D, (H, W), dtype=np.int32))
    disp = jnp.asarray(rng.uniform(0, D - 1, (H, W)).astype(np.float32))
    ms = _timed_device_loop(lambda a, b: dr_consistency(a, b, D, 1),
                            d_r, disp, iters=20) * 1e3
    rec("micro/dr_consistency_jnp_ms", round(ms, 3))
    ms = _timed_device_loop(lambda a, b: dr_consistency_pallas(a, b, D, 1),
                            d_r, disp, iters=20) * 1e3
    rec("micro/dr_consistency_pallas_ms", round(ms, 3))

    # horizontal (transposed-layout) sweep: R=1 vs fattened
    Ct = jnp.asarray(rng.integers(0, 24, (Wq, Hp, D), dtype=np.uint8))
    St = jnp.asarray(rng.integers(0, 2000, (Wq, Hp, D), dtype=np.int16))
    for r_ in (1, 8, 16):
        def hsweep(c, s, r_=r_):
            return sgm_sweep(c, s, (0,), False, p1=10, p2=120, n_real=H,
                             d_real=D, rows_per_step=r_)
        ms = _timed_device_loop(hsweep, Ct, St, iters=10) * 1e3
        rec(f"micro/h_sweep_R{r_}_ms", round(ms, 3))
    for r_ in (1, 16):
        def bwd(c, s, r_=r_):
            return sweep_bwd_wta(c, s, kitti, w_real=W, d_real=D,
                                 rows_per_step=r_)[0]
        ms = _timed_device_loop(bwd, Ct, St, iters=10) * 1e3
        rec(f"micro/bwd_wta_R{r_}_ms", round(ms, 3))

    # transpose variants
    Cv8 = jnp.asarray(rng.integers(0, 24, (Hp, Wq, D), dtype=np.uint8))
    Sv16 = jnp.asarray(rng.integers(0, 2000, (Hp, Wq, D), dtype=np.int16))
    for th in (8, 16, 32):
        ms = _timed_device_loop(
            lambda x, th=th: transpose_hw_pallas(x, trim=False, th=th),
            Sv16, iters=10) * 1e3
        rec(f"micro/transpose_i16_th{th}_ms", round(ms, 3))
    ms = _timed_device_loop(
        lambda x: transpose_hw_pallas(x, trim=False), Cv8, iters=10) * 1e3
    rec("micro/transpose_u8_th8_ms", round(ms, 3))
    ms = _timed_device_loop(
        lambda x: jnp.swapaxes(x, 0, 1), Sv16, iters=10) * 1e3
    rec("micro/transpose_i16_xla_ms", round(ms, 3))

    # ---- 3. in-context decomposition: partial pipelines, differenced ------
    from tpustereo.kernels import census_cost_volume_pallas
    from tpustereo.kernels.sgm_pallas import _p2_stack, sgm_select_pallas
    from tpustereo.pipeline.sgbm import _postproc

    L8, R8, _, _ = synthetic_pair((H, W), disparity=40.0, slope=0.02, seed=0)
    L8, R8 = jnp.asarray(L8), jnp.asarray(R8)
    cfg = kitti
    down = [(1, 0), (1, 1), (1, -1)]
    up = [(-1, 0), (-1, 1), (-1, -1)]
    dxs_v = (0, 1, -1)

    def p_cost(l, r):
        return census_cost_volume_pallas(l, r, D, 24, (5, 5), padded=True)

    def p_down(l, r):
        C = p_cost(l, r)
        return sgm_sweep(C, None, dxs_v, False, p1=cfg.p1, p2=cfg.p2,
                         n_real=W, d_real=D)

    def p_up(l, r):
        C = p_cost(l, r)
        S = sgm_sweep(C, None, dxs_v, False, p1=cfg.p1, p2=cfg.p2,
                      n_real=W, d_real=D)
        return sgm_sweep(C, S, dxs_v, True, p1=cfg.p1, p2=cfg.p2,
                         n_real=W, d_real=D)

    def p_ct(l, r):
        C = p_cost(l, r)
        S = sgm_sweep(C, None, dxs_v, False, p1=cfg.p1, p2=cfg.p2,
                      n_real=W, d_real=D)
        S = sgm_sweep(C, S, dxs_v, True, p1=cfg.p1, p2=cfg.p2,
                      n_real=W, d_real=D)
        return transpose_hw_pallas(C, trim=False), S

    def p_st(l, r):
        Ct_, S = p_ct(l, r)
        return Ct_, transpose_hw_pallas(S, trim=False)

    def p_fwd(l, r):
        Ct_, St_ = p_st(l, r)
        return sgm_sweep(Ct_, St_, (0,), False, p1=cfg.p1, p2=cfg.p2,
                         n_real=H, d_real=D)

    def p_select(l, r):
        C = p_cost(l, r)
        return sgm_select_pallas(C, cfg, l, dims=(l.shape[0], l.shape[1], D))[0]

    def p_full(l, r):
        return sgbm.__wrapped__(l, r, cfg)

    for name, fn in [("cost", p_cost), ("cost+down", p_down),
                     ("cost+down+up", p_up), ("..+Ct", p_ct),
                     ("..+St", p_st), ("..+fwd", p_fwd),
                     ("select", p_select), ("full", p_full)]:
        ms = _timed_device_loop(fn, L8, R8, iters=10) * 1e3
        rec(f"decomp/{name}_ms", round(ms, 3))

    # ---- 4. true Middlebury geometry (VERDICT #7) -------------------------
    mb = PRESETS["middlebury_sgm4"]
    exactness("middlebury_sgm4_750x1500", mb, (750, 1500), disparity=80.0)
    r = run_benchmark(mb, shape=(750, 1500), batch=2, iters=5)
    rec("bench/middlebury_half_750x1500", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(mb, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_1500x3000", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(PRESETS["middlebury_census_wta"], shape=(750, 1500),
                      batch=2, iters=5)
    rec("bench/census_wta_750x1500", {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
