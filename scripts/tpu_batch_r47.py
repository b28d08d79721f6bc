"""Round-5 TPU batch #47 (batch A — zero-new-kernel measurements).

VERDICT r4 items that need only HEAD code + toggles:
1. Canary: kitti8 headline (cached program) + sgm4 preset.
2. True-Middlebury rows at HEAD defaults (VERDICT missing #4): 750x1500
   and 1500x3000 middlebury_sgm4 throughput (last measured r27,
   pre-SWAR/pre-bf16).
3. Config-1 tsukuba_sad decomposition (VERDICT weak #1): full-pipeline
   batch-marginal (B=8 vs B=24 differenced — the ~2.4 ms/iteration
   harness floor cancels) + standalone sad_volume and WTA-from-volume
   k-loop marginals. Names the dominant term the round-5 SAD kernel
   must beat.
4. bwd+WTA column-fattening A/B (VERDICT next #6): BWD_ROWS in {8, 64}
   full-pipeline vs the R=1 default, plus an on-chip R=8-vs-R=1
   consistency check.
5. BWD_BF16=True full-pipeline A/B at TODAY's HEAD (the r43b reading
   predates the preset-F fix and r44-r46).
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r47_results.json"
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
    from tpustereo.data.synthetic import synthetic_pair
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)

    # 1) canaries --------------------------------------------------------
    try:
        r = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242),
                          batch=16, iters=20)
        rec("canary/kitti8_fps", r["value"])
        rec("canary/kitti8_ms", r["ms_per_frame"])
    except Exception as e:
        rec("error/canary", repr(e)[:400]); traceback.print_exc()

    # 2) true-Middlebury rows at HEAD defaults ---------------------------
    for name, shape, batch, iters in (
            ("mid750", (750, 1500), 4, 10),
            ("midfull", (1500, 3000), 4, 3)):
        try:
            r = run_benchmark(PRESETS["middlebury_sgm4"], shape=shape,
                              batch=batch, iters=iters)
            rec(f"mid/{name}_fps", r["value"])
            rec(f"mid/{name}_ms", r["ms_per_frame"])
        except Exception as e:
            rec(f"error/{name}", repr(e)[:400]); traceback.print_exc()

    # sgm4 preset canary at its published geometry
    try:
        r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(375, 1242),
                          batch=16, iters=20)
        rec("canary/sgm4_fps", r["value"])
    except Exception as e:
        rec("error/sgm4", repr(e)[:400])

    # 3) tsukuba_sad decomposition ---------------------------------------
    cfg1 = PRESETS["tsukuba_sad"]
    H, W = 288, 384
    L, R, _, _ = synthetic_pair((H, W), disparity=20.0, slope=0.05, seed=0)
    try:
        from tpustereo.pipeline import sgbm_batched
        ts = {}
        for B in (8, 24):
            lefts = jnp.asarray(np.stack([L] * B))
            rights = jnp.asarray(np.stack([R] * B))
            ts[B] = _timed_device_loop(
                lambda l, r: sgbm_batched(l, r, cfg1), lefts, rights,
                iters=20)
        marg = (ts[24] - ts[8]) / 16
        rec("sad/full_ms_per_frame_marginal", round(marg * 1e3, 3))
        rec("sad/full_fps_marginal", round(1.0 / marg, 1))
        rec("sad/full_ms_per_frame_b8", round(ts[8] / 8 * 1e3, 3))
    except Exception as e:
        rec("error/sad_full", repr(e)[:400]); traceback.print_exc()

    def k_loop_marginal(fn, x, klo=4, khi=12, iters=10):
        """ms per call of fn(x), two in-program k-loops differenced."""
        import jax
        def k_runner(k):
            def many(v):
                def body(i, acc):
                    f = v.reshape(-1)
                    vv = f.at[0].set((i % 7).astype(f.dtype)).reshape(v.shape)
                    out = fn(vv)
                    return acc + jax.tree_util.tree_leaves(out)[0].astype(
                        jnp.float32).sum()
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return many
        tlo = _timed_device_loop(k_runner(klo), x, iters=iters)
        thi = _timed_device_loop(k_runner(khi), x, iters=iters)
        return (thi - tlo) / (khi - klo) * 1e3

    try:
        from tpustereo.ops import sad_volume
        lj = jnp.asarray(L)
        rj = jnp.asarray(R)
        m = k_loop_marginal(
            lambda l: sad_volume(l, rj, cfg1.num_disparities,
                                 cfg1.sad_block), lj)
        rec("sad/sad_volume_ms_marginal", round(m, 3))
    except Exception as e:
        rec("error/sad_vol", repr(e)[:400]); traceback.print_exc()
    try:
        from tpustereo.kernels import wta_lr_pallas
        from tpustereo.ops import sad_volume
        S = jax.jit(lambda l, r: sad_volume(l, r, cfg1.num_disparities,
                                            cfg1.sad_block))(lj, rj)
        m = k_loop_marginal(lambda s: wta_lr_pallas(s, cfg1)[0],
                            S.astype(jnp.int32))
        rec("sad/wta_from_volume_ms_marginal", round(m, 3))
    except Exception as e:
        rec("error/sad_wta", repr(e)[:400]); traceback.print_exc()

    # 4) bwd column fattening --------------------------------------------
    from tpustereo.kernels import sgm_pallas as sp
    from tpustereo.pipeline.sgbm import sgbm
    cfg4 = PRESETS["kitti_sgm8"]
    try:
        Lk, Rk, _, _ = synthetic_pair((375, 1242), disparity=40.0,
                                      slope=0.02, seed=0)
        base = np.asarray(sgbm(jnp.asarray(Lk), jnp.asarray(Rk),
                               cfg4.replace(frames_per_step=1)))
        for rows in (8, 64):
            sp.BWD_ROWS = rows
            jax.clear_caches()
            r = run_benchmark(cfg4, shape=(375, 1242), batch=16, iters=20)
            rec(f"bwdrows/{rows}_fps", r["value"])
            if rows == 8:
                out = np.asarray(sgbm(jnp.asarray(Lk), jnp.asarray(Rk),
                                      cfg4.replace(frames_per_step=1)))
                rec("bwdrows/8_consistent_vs_r1",
                    bool(np.array_equal(base, out)))
        sp.BWD_ROWS = 1
        jax.clear_caches()
    except Exception as e:
        sp.BWD_ROWS = 1
        jax.clear_caches()
        rec("error/bwdrows", repr(e)[:400]); traceback.print_exc()

    # 5) BWD_BF16 at today's HEAD ----------------------------------------
    try:
        sp.BWD_BF16 = True
        jax.clear_caches()
        r = run_benchmark(cfg4, shape=(375, 1242), batch=16, iters=20)
        rec("bwdbf16/kitti8_fps", r["value"])
        r = run_benchmark(PRESETS["middlebury_sgm4"], shape=(375, 1242),
                          batch=16, iters=20)
        rec("bwdbf16/sgm4_fps", r["value"])
        sp.BWD_BF16 = False
        jax.clear_caches()
    except Exception as e:
        sp.BWD_BF16 = False
        jax.clear_caches()
        rec("error/bwdbf16", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
