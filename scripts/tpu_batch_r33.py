"""Round-3 TPU batch #33: core per-kernel split at HEAD (SWAR) — cost,
vertical sweeps, fwd, bwd+WTA standalone at production F=4 shapes — to
decide whether the bwd kernel's SGM portion is worth SWARing."""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r33_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.eval.bench import _timed_device_loop
    from tpustereo.config import PRESETS
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)
    F = 4
    try:
        refs = np.load("/tmp/r29_refs/kitti4.npz")
        Ls = jnp.asarray(np.stack([refs[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([refs[f"R{f}"] for f in range(4)]))
        from tpustereo.kernels import census_cost_volume_pallas
        cost = lambda l, r: census_cost_volume_pallas(l, r, 128, 24, (5, 5), padded=True, with_transposed=True)
        s = _timed_device_loop(cost, Ls, Rs, iters=10)
        rec("split/cost_ms_per_frame", round(s / F * 1e3, 3))
    except Exception as e:
        rec("error/cost", repr(e)[:400]); traceback.print_exc()
    try:
        Cv = jnp.asarray(rng.integers(0, 25, (376 * F, 1280, 128)).astype(np.int8))
        vert = lambda c: sp.sgm_sweep(c, None, (0, 1, -1), False, p1=10, p2=120, n_real=1242, d_real=128, frames=F)
        s = _timed_device_loop(vert, Cv, iters=10)
        rec("split/vert_sweep_ms_per_frame", round(s / F * 1e3, 3))
        sp.SWEEP_SWAR = False; jax.clear_caches()
        s = _timed_device_loop(vert, Cv, iters=10)
        rec("split/vert_sweep_v32_ms_per_frame", round(s / F * 1e3, 3))
        sp.SWEEP_SWAR = True; jax.clear_caches()
    except Exception as e:
        rec("error/vert", repr(e)[:400]); traceback.print_exc()
        sp.SWEEP_SWAR = True; jax.clear_caches()
    try:
        Ct = jnp.asarray(rng.integers(0, 25, (1280, 1504, 128)).astype(np.int8))
        St = jnp.asarray(rng.integers(0, 500, (1280, 1504, 128)).astype(np.int16))
        fwd = lambda c, s_: sp.sgm_sweep(c, s_, (0,), False, p1=10, p2=120, n_real=375, d_real=128)
        s = _timed_device_loop(fwd, Ct, St, iters=10)
        rec("split/fwd_sweep_ms_per_frame", round(s / F * 1e3, 3))
        cfg = PRESETS["kitti_sgm8"]
        bwd = lambda c, s_: sp.sweep_bwd_wta(c, s_, cfg, w_real=1242, d_real=128)[0]
        s = _timed_device_loop(bwd, Ct, St, iters=10)
        rec("split/bwd_wta_ms_per_frame", round(s / F * 1e3, 3))
    except Exception as e:
        rec("error/horiz", repr(e)[:400]); traceback.print_exc()
    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
