"""Round-4 TPU batch #43c: bf16 hybrid tree + per-kernel combo A/B.

r43b: all-bf16 pipeline exact on chip, headline 78.9 (+3%) but sgm4
90.5 (-8%), micro bf16 step 1.06x swar — bitcasts (~18x an int32 roll)
dominate: the tree paid 14/step. This batch measures:
1. The reworked step (tree = SWAR-min on the int32 bit view of the
   monotone positive patterns, 2 bitcasts total; shared neighbour-roll
   bitcast): micro exactness + timing vs swar.
2. The (SWEEP_BF16, BWD_BF16) combo space at kitti8 F=4 b16 and sgm4:
   per-kernel adoption — the bwd kernel's bf16 (full-width WTA, no
   half-splitting) may be the whole r43b headline win.
3. Exactness small+kitti_f0 at (T,T) with the new tree.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r43c_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.kernels.width_micro import sweep_micro
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.config import PRESETS
    from tpustereo.pipeline.sgbm import sgbm
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)

    # 1) micro with the hybrid tree
    try:
        T, N, D = 376, 1280, 128
        C = jnp.asarray(rng.integers(0, 25, (T, N, D)).astype(np.int8))
        a = np.asarray(sweep_micro(C[:8, :64], "v32_i8"))
        b = np.asarray(sweep_micro(C[:8, :64], "bf16_i8"))
        rec("width/bf16_exact_small", {"n_mismatch": int((a != b).sum())})
        times = {}
        for mode in ("swar_i8", "bf16_i8"):
            s = _timed_device_loop(lambda c, m=mode: sweep_micro(c, m), C,
                                   iters=10)
            times[mode] = round(s / T * 1e6, 3)
        times["bf16_vs_swar"] = round(times["bf16_i8"] / times["swar_i8"], 3)
        rec("width/i8_sweep_step_us_hybrid_tree", times)
    except Exception as e:
        rec("error/width", repr(e)[:400]); traceback.print_exc()

    # 2+3) combo space
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)
    combos = (("sweepT_bwdT", True, True), ("sweepT_bwdF", True, False),
              ("sweepF_bwdT", False, True))
    for name, s_flag, b_flag in combos:
        try:
            sp.SWEEP_BF16, sp.BWD_BF16 = s_flag, b_flag
            jax.clear_caches()
            if name == "sweepT_bwdT":
                r = np.load("/tmp/r29_refs/small.npz")
                got = np.asarray(sgbm(jnp.asarray(r["L"]),
                                      jnp.asarray(r["R"]),
                                      k1)).astype(np.float64)
                d = np.abs(got - r["out"])
                rec("exact/bf16_small_hybrid",
                    {"max_abs": float(d.max()),
                     "n_mismatch": int((d > 1e-4).sum())})
                r = np.load("/tmp/r29_refs/kitti4.npz")
                got = np.asarray(sgbm(jnp.asarray(r["L0"]),
                                      jnp.asarray(r["R0"]),
                                      k1)).astype(np.float64)
                d = np.abs(got - r["out0"])
                rec("exact/bf16_kitti_f0_hybrid",
                    {"max_abs": float(d.max()),
                     "n_mismatch": int((d > 1e-4).sum())})
            rb = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242),
                               batch=16, iters=20)
            rec(f"bench/kitti8_{name}", {k: rb[k] for k in
                                         ("value", "ms_per_frame")})
            rb = run_benchmark(PRESETS["middlebury_sgm4"],
                               shape=(375, 1242), batch=8, iters=20)
            rec(f"bench/sgm4_{name}", {k: rb[k] for k in
                                       ("value", "ms_per_frame")})
        except Exception as e:
            rec(f"error/{name}", repr(e)[:500]); traceback.print_exc()
        finally:
            sp.SWEEP_BF16, sp.BWD_BF16 = False, False
            jax.clear_caches()

    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
