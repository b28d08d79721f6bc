"""Round-4 TPU batch #43d: bf16 combo A/B with the reverted (bf16-min)
tree — r43c showed the SWAR-min-on-bit-view tree is SLOWER end to end
(75.0 vs 78.9 kitti8), so the r43b tree form is back (plus the shared
neighbour-roll bitcast). Measures the per-kernel combos under it, the
step micro, and exactness canaries for the adopted form.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r43d_results.json"
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
        rec("width/i8_sweep_step_us", times)
    except Exception as e:
        rec("error/width", repr(e)[:400]); traceback.print_exc()

    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)
    combos = (("sweepT_bwdT", True, True), ("sweepT_bwdF", True, False),
              ("sweepF_bwdT", False, True))
    for name, s_flag, b_flag in combos:
        try:
            sp.SWEEP_BF16, sp.BWD_BF16 = s_flag, b_flag
            jax.clear_caches()
            if name == "sweepT_bwdT":
                for nm, key in (("small", None), ("kitti_f0", "0")):
                    r = np.load(f"/tmp/r29_refs/"
                                f"{'small' if key is None else 'kitti4'}"
                                f".npz")
                    L = r["L" if key is None else "L0"]
                    R = r["R" if key is None else "R0"]
                    out = r["out" if key is None else "out0"]
                    got = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R),
                                          k1)).astype(np.float64)
                    d = np.abs(got - out)
                    rec(f"exact/bf16_{nm}", {"max_abs": float(d.max()),
                                             "n_mismatch":
                                             int((d > 1e-4).sum())})
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
