"""Round-4 TPU batch #43b: bf16 design B — rolls through int32 bitcast
views.

r43 found: bf16 elementwise min/add LEGALIZE on chip, bf16 rolls do NOT
(either axis), and the CH=32 chain micros are floor-dominated (~2.6 ms
per timed-loop iteration regardless of op count — which also puts r29b's
2.75x roll penalty in question). This batch:

1. Marginal-cost chains: two chain lengths differenced (the floor
   cancels) for i32 elem / bf16 elem / i32 roll / bf16 bitcast-roll —
   the true ALU-rate ratio, the true roll:ALU penalty (roofline input),
   and the bitcast overhead.
2. The production-I/O sweep-step micro, now running the PRODUCTION
   _dir_step_bf16 (bitcast rolls): exactness + timing vs swar_i8.
3. Full-pipeline bf16: exactness (small + kitti f0) and the judged
   headline + sgm4 A/B.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r43b_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.kernels.width_micro import (bf16_roll_chain_micro,
                                               elem_chain_micro,
                                               roll_chain_micro, sweep_micro)
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)

    # 1) marginal-cost chains
    CH_LO, CH_HI = 64, 512
    shape = (1248, 128)
    xi = rng.integers(0, 200, shape).astype(np.int32)
    chains = {
        "elem_i32": (lambda v, ch: elem_chain_micro(v, ch), jnp.int32, 3),
        "elem_bf16": (lambda v, ch: elem_chain_micro(v, ch),
                      jnp.bfloat16, 3),
        "roll_i32": (lambda v, ch: roll_chain_micro(v, ch), jnp.int32, 1),
        "roll_bf16_bc": (lambda v, ch: bf16_roll_chain_micro(v, ch),
                         jnp.bfloat16, 1),
    }
    marg = {}
    for name, (fn, dt, ops_per) in chains.items():
        try:
            x = jnp.asarray(xi).astype(dt)
            ts = {}
            for ch in (CH_LO, CH_HI):
                ts[ch] = _timed_device_loop(
                    lambda v, c=ch: fn(v, c), x, iters=10)
            m = (ts[CH_HI] - ts[CH_LO]) / ((CH_HI - CH_LO) * ops_per)
            marg[name] = m
            rec(f"chain/{name}", {
                "t64_us": round(ts[CH_LO] * 1e6, 2),
                "t512_us": round(ts[CH_HI] * 1e6, 2),
                "marginal_ns_per_op": round(m * 1e9, 2)})
        except Exception as e:
            rec(f"error/chain_{name}", repr(e)[:400]); traceback.print_exc()
    try:
        rec("chain/ratios", {
            "bf16_vs_i32_alu": round(marg["elem_bf16"] / marg["elem_i32"],
                                     3),
            "roll_vs_alu_i32": round(marg["roll_i32"] / marg["elem_i32"],
                                     3),
            "bc_roll_vs_i32_roll": round(marg["roll_bf16_bc"]
                                         / marg["roll_i32"], 3)})
    except Exception:
        pass

    # 2) production-I/O sweep-step micro (bitcast-roll bf16 step)
    try:
        T, N, D = 376, 1280, 128
        C = jnp.asarray(rng.integers(0, 25, (T, N, D)).astype(np.int8))
        small = C[:8, :64]
        a = np.asarray(sweep_micro(small, "v32_i8"))
        b = np.asarray(sweep_micro(small, "bf16_i8"))
        rec("width/bf16_exact_small", {"n_mismatch": int((a != b).sum())})
        af = np.asarray(sweep_micro(C, "v32_i8"))
        bf = np.asarray(sweep_micro(C, "bf16_i8"))
        rec("width/bf16_exact_prod", {"n_mismatch": int((af != bf).sum()),
                                      "n": int(af.size)})
        times = {}
        for mode in ("v32_i8", "swar_i8", "bf16_i8"):
            s = _timed_device_loop(lambda c, m=mode: sweep_micro(c, m), C,
                                   iters=10)
            times[mode] = round(s / T * 1e6, 3)
        times["bf16_vs_swar"] = round(times["bf16_i8"] / times["swar_i8"], 3)
        rec("width/i8_sweep_step_us", times)
    except Exception as e:
        rec("error/width_bf16", repr(e)[:400]); traceback.print_exc()

    # 3) full pipeline bf16: exactness then the judged A/B
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.config import PRESETS
    from tpustereo.pipeline.sgbm import sgbm
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)
    try:
        sp.SWEEP_BF16 = True
        jax.clear_caches()
        r = np.load("/tmp/r29_refs/small.npz")
        got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                              k1)).astype(np.float64)
        d = np.abs(got - r["out"])
        rec("exact/bf16_small", {"max_abs": float(d.max()),
                                 "n_mismatch": int((d > 1e-4).sum()),
                                 "n_px": int(d.size)})
        r = np.load("/tmp/r29_refs/kitti4.npz")
        got = np.asarray(sgbm(jnp.asarray(r["L0"]), jnp.asarray(r["R0"]),
                              k1)).astype(np.float64)
        d = np.abs(got - r["out0"])
        rec("exact/bf16_kitti_f0", {"max_abs": float(d.max()),
                                    "n_mismatch": int((d > 1e-4).sum())})
        if (d > 1e-4).sum() == 0:
            rb = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242),
                               batch=16, iters=20)
            rec("bench/headline_bf16", {k: rb[k] for k in
                                        ("value", "ms_per_frame")})
            rb = run_benchmark(PRESETS["middlebury_sgm4"],
                               shape=(375, 1242), batch=8, iters=20)
            rec("bench/sgm4_bf16", {k: rb[k] for k in
                                    ("value", "ms_per_frame")})
    except Exception as e:
        rec("error/bf16_full", repr(e)[:600]); traceback.print_exc()
    finally:
        sp.SWEEP_BF16 = False
        jax.clear_caches()

    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
