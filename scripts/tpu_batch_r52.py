"""Round-5 TPU batch #52: where does the adaptive core gap actually sit?

r51 refuted the sweep-side map-read hypothesis (stacked reads cost only
~0.18 ms/sweep; split is worse). Remaining candidates for the ~4.5 ms:
the XLA-side construction of the 8 directional P2' maps (gradients,
f32-div quotients, per-frame pads/stacks, and the TRANSPOSED (Wq, N, 1)
maps for the horizontal sweeps) and the v32 bwd recurrence. Measure:

1. maps-only program: exactly the four `_p2_stack` calls the fused
   pipeline traces (down/up stacked K=3, fwd/bwd transposed K=1) at
   KITTI F=4 geometry, timed alone.
2. bwd-only adaptive: standalone sweep_bwd_wta with a (T, N, 1) map vs
   the SWAR no-map control.
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r52_results.json"
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
    from tpustereo.eval.bench import _timed_device_loop
    from tpustereo.kernels.sgm_pallas import _p2_stack, sweep_bwd_wta
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)
    cfg = PRESETS["kitti_sgm8"].replace(adaptive_p2=True)
    F, H, W, D = 4, 375, 1242, 128
    Hp, Wq = 376, 1280
    down = [(1, 0), (1, 1), (1, -1)]
    up = [(-1, 0), (-1, 1), (-1, -1)]

    try:
        img = jnp.asarray(rng.integers(0, 255, (F, H, W)).astype(np.uint8))

        def maps_only(im):
            a = _p2_stack(im, down, cfg, False, F * Hp, Wq)
            b = _p2_stack(im, up, cfg, False, F * Hp, Wq)
            c = _p2_stack(im, [(0, 1)], cfg, True, Wq, F * Hp)
            d = _p2_stack(im, [(0, -1)], cfg, True, Wq, F * Hp)
            return (a.sum() + b.sum() + c.sum() + d.sum())

        s = _timed_device_loop(maps_only, img, iters=10) / F * 1e3
        rec("maps/all8_ms_per_frame", round(s, 3))

        def maps_vert(im):
            a = _p2_stack(im, down, cfg, False, F * Hp, Wq)
            b = _p2_stack(im, up, cfg, False, F * Hp, Wq)
            return a.sum() + b.sum()

        s = _timed_device_loop(maps_vert, img, iters=10) / F * 1e3
        rec("maps/vertical6_ms_per_frame", round(s, 3))
    except Exception as e:
        rec("error/maps", repr(e)[:400]); traceback.print_exc()

    try:
        Ct = jnp.asarray(rng.integers(0, 25, (Wq, F * Hp, D)).astype(np.int8))
        St = jnp.asarray(rng.integers(0, 900,
                                      (Wq, F * Hp, D)).astype(np.int16))
        P2b = jnp.asarray(rng.integers(11, 121,
                                       (Wq, F * Hp, 1)).astype(np.int32))
        s = _timed_device_loop(
            lambda c, st: sweep_bwd_wta(c, st, cfg, w_real=W, d_real=D)[0],
            Ct, St, iters=10) / F * 1e3
        rec("bwd/no_p2_swar_ms_per_frame", round(s, 3))
        s = _timed_device_loop(
            lambda c, st, m: sweep_bwd_wta(c, st, cfg, w_real=W, d_real=D,
                                           p2_maps=m)[0],
            Ct, St, P2b, iters=10) / F * 1e3
        rec("bwd/p2_v32_ms_per_frame", round(s, 3))
    except Exception as e:
        rec("error/bwd", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
