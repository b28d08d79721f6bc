"""Round-4 TPU batch #45: issue-rate table + per-kernel core split at
HEAD (bf16 sweeps).

1. Register-only min/add chains (no per-op VMEM reads), two lengths
   differenced, for int32 / float32 / bfloat16 / int16(expected fail) —
   the TRUE per-dtype ALU issue rates. The r43b elem chain re-read its
   input per op, so its 4.2x bf16-vs-i32 ratio conflates ALU with load
   bytes. If f32 min/add issue ~2x int32, the WTA's packed-argmin trees
   ((S<<8)+lane < 2^20, f32-exact) are the next lever; if not, that
   door closes.
2. Standalone per-kernel timings at HEAD defaults (cost, vertical sweep
   bf16, fwd bf16, bwd+WTA swar) for BASELINE's core split bookkeeping.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r45_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    from tpustereo.eval.bench import _timed_device_loop
    from tpustereo.kernels.width_micro import reg_chain_micro
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)

    CH_LO, CH_HI = 64, 512
    xi = rng.integers(0, 200, (1248, 128)).astype(np.int32)
    marg = {}
    for name, dt in (("i32", jnp.int32), ("f32", jnp.float32),
                     ("bf16", jnp.bfloat16), ("i16", jnp.int16)):
        try:
            x = jnp.asarray(xi).astype(dt)
            ts = {}
            for ch in (CH_LO, CH_HI):
                ts[ch] = _timed_device_loop(
                    lambda v, c=ch: reg_chain_micro(v, c), x, iters=10)
            m = (ts[CH_HI] - ts[CH_LO]) / ((CH_HI - CH_LO) * 3)
            marg[name] = m
            rec(f"regchain/{name}_marginal_ns_per_op", round(m * 1e9, 2))
        except Exception as e:
            rec(f"error/regchain_{name}", repr(e)[:300])
    try:
        rec("regchain/ratios",
            {f"{k}_vs_i32": round(v / marg["i32"], 3)
             for k, v in marg.items() if k != "i32"})
    except Exception:
        pass

    # 2) per-kernel split at HEAD (F=4 KITTI shapes, standalone launches)
    try:
        from tpustereo.config import PRESETS
        from tpustereo.kernels.sgm_pallas import sgm_sweep, sweep_bwd_wta
        from tpustereo.kernels import census_cost_volume_pallas
        cfg = PRESETS["kitti_sgm8"]
        F, H, W, D = 4, 375, 1242, 128
        Hp, Wq = 376, 1280
        C = jnp.asarray(rng.integers(0, 25, (F * Hp, Wq, D)).astype(np.int8))
        Ct = jnp.asarray(rng.integers(0, 25, (Wq, F * Hp, D)).astype(np.int8))
        St = jnp.asarray(rng.integers(0, 900, (Wq, F * Hp, D)).astype(np.int16))
        L = jnp.asarray(rng.integers(0, 255, (F, H, W)).astype(np.uint8))
        R = jnp.asarray(rng.integers(0, 255, (F, H, W)).astype(np.uint8))

        s = _timed_device_loop(
            lambda l, r: census_cost_volume_pallas(
                l, r, D, cfg.max_census_cost, cfg.census_window,
                padded=True), L, R, iters=10)
        rec("split/cost_ms_per_frame", round(s / F * 1e3, 3))
        s = _timed_device_loop(
            lambda c: sgm_sweep(c, None, (0, 1, -1), False, p1=cfg.p1,
                                p2=cfg.p2, n_real=W, d_real=D, frames=F,
                                c_max=cfg.max_census_cost), C, iters=10)
        rec("split/vertical_sweep_ms_per_frame", round(s / F * 1e3, 3))
        s = _timed_device_loop(
            lambda c, st: sgm_sweep(c, st, (0,), False, p1=cfg.p1,
                                    p2=cfg.p2, n_real=H, d_real=D,
                                    c_max=cfg.max_census_cost), Ct,
            St.astype(jnp.int16), iters=10)
        rec("split/fwd_sweep_ms_per_frame", round(s / F * 1e3, 3))
        s = _timed_device_loop(
            lambda c, st: sweep_bwd_wta(c, st, cfg, w_real=W, d_real=D)[0],
            Ct, St, iters=10)
        rec("split/bwd_wta_ms_per_frame", round(s / F * 1e3, 3))
    except Exception as e:
        rec("error/split", repr(e)[:500]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
