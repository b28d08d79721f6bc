"""Round-4 TPU batch #43: bfloat16 sweep-step probes.

The SWAR-true roofline (r40/BASELINE round-4) concluded the core's
remaining headroom is ALGORITHMIC — fewer ops, not better scheduling.
The bf16 formulation is exactly that: every value in the renormalized
SGM recurrence is an integer <= c_max+p2+p1 (154 KITTI / 192 at 9x7),
which bfloat16 represents exactly, so the step can ride native bf16
SIMD — 2 values per 32-bit lane with 1-op mins instead of the ~12-bit-op
exact SWAR min, and Mosaic owns the packed layout (no seam fixups).

Open questions only the chip can answer (int16 rolls and minsi both
failed to legalize on this toolchain — r1/r29):
  a) do bf16 LANE rolls legalize, and at what cost vs int32 rolls?
  b) do bf16 SUBLANE rolls legalize (diagonal directions need them)?
  c) does bf16 elementwise min/add run at ~2x int32 rate?
  d) end to end: does the bf16_i8 step beat swar_i8 (the shipped one)?
  e) is it exact on chip (interpret already exact; Mosaic bugs only
     surface compiled — CLAUDE.md)?
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r43_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    from tpustereo.eval.bench import _timed_device_loop
    from tpustereo.kernels.width_micro import (elem_chain_micro,
                                               roll_chain_micro, sweep_micro)
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)

    # a+b) roll legalization/cost: lane + sublane chains, bf16 vs int32,
    # exactness vs numpy (the roll chain is a fixed permutation)
    CH = 32
    shape = (1248, 128)
    xi = rng.integers(0, 200, shape).astype(np.int32)
    for name, arr, dt in (("i32", xi, jnp.int32),
                          ("bf16", xi, jnp.bfloat16)):
        x = jnp.asarray(arr).astype(dt)
        for axname, ax in (("lane", 1), ("sub", 0)):
            try:
                got = np.asarray(roll_chain_micro(x, CH, axis=ax)
                                 ).astype(np.int64)
                exp = xi.copy()
                for i in range(CH):
                    exp = np.roll(exp, 1 + (i & 1), axis=ax)
                rec(f"roll/{name}_{axname}_exact",
                    {"n_mismatch": int((got != exp).sum())})
                s = _timed_device_loop(
                    lambda v: roll_chain_micro(v, CH, axis=ax), x, iters=10)
                rec(f"roll/{name}_{axname}_ns_per_op",
                    round(s / CH * 1e9, 1))
            except Exception as e:
                rec(f"error/roll_{name}_{axname}", repr(e)[:400])
                traceback.print_exc()

    # c) elementwise min/add chain: bf16 vs int32 rate
    for name, dt in (("i32", jnp.int32), ("bf16", jnp.bfloat16)):
        try:
            x = jnp.asarray(xi).astype(dt)
            s = _timed_device_loop(lambda v: elem_chain_micro(v, CH), x,
                                   iters=10)
            rec(f"elem/{name}_ns_per_op", round(s / CH * 1e9, 1))
        except Exception as e:
            rec(f"error/elem_{name}", repr(e)[:400]); traceback.print_exc()

    # d+e) the decisive number: full axial sweep step, production I/O
    # (int8 cost in, int16 S out, identical HBM bytes all modes)
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

    # f) full-kernel integration (SWEEP_BF16 branch landed in sgm_pallas,
    # interpret-exact): exactness vs CPU refs, then the judged-composition
    # A/B. Runs regardless of the micro outcomes — a compile failure here
    # is itself the answer (recorded, not fatal).
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.config import PRESETS
    from tpustereo.pipeline.sgbm import sgbm
    from tpustereo.eval.bench import run_benchmark
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)
    try:
        sp.SWEEP_BF16 = True
        jax.clear_caches()
        for name, npz in (("bf16_small", "/tmp/r29_refs/small.npz"),):
            r = np.load(npz)
            got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                                  k1)).astype(np.float64)
            d = np.abs(got - r["out"])
            rec(f"exact/{name}", {"max_abs": float(d.max()),
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
