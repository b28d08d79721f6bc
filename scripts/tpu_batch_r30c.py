"""Round-3 TPU batch #30c: SWAR bisect at PRODUCTION shapes (r30b: all
tiny cases exact on chip; r30: full pipeline off by subpixel deltas on
1.6% of pixels). Compare SWAR-on-chip vs v32-on-chip per sweep at the
real slab geometries, then the full select composition."""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r30c_results.json"
results = {}


def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    import tpustereo.kernels.sgm_pallas as sp
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)

    def ab(name, fn):
        try:
            sp.SWEEP_SWAR = True
            jax.clear_caches()
            on = np.asarray(fn())
            sp.SWEEP_SWAR = False
            jax.clear_caches()
            off = np.asarray(fn())
            d = (on.astype(np.int64) != off.astype(np.int64))
            rec(f"ab/{name}", {"n_mismatch": int(d.sum()),
                               "max_abs": int(np.abs(on.astype(np.int64)
                                                     - off.astype(np.int64)).max())})
            return on, off
        except Exception as e:  # noqa: BLE001
            rec(f"error/{name}", repr(e)[:400])
            traceback.print_exc()
            return None, None
        finally:
            sp.SWEEP_SWAR = True
            jax.clear_caches()

    # vertical sweep, true KITTI geometry (single frame)
    Cv = jnp.asarray(rng.integers(0, 25, (376, 1280, 128)).astype(np.int8))
    ab("vert_down_F1", lambda: sp.sgm_sweep(
        Cv, None, (0, 1, -1), False, p1=10, p2=120, n_real=1242, d_real=128))
    ab("vert_up_F1", lambda: sp.sgm_sweep(
        Cv, None, (0, 1, -1), True, p1=10, p2=120, n_real=1242, d_real=128))

    # frame-stacked vertical (4 frames on the scan axis, seam resets)
    Cv4 = jnp.asarray(rng.integers(0, 25, (376 * 4, 1280, 128)).astype(np.int8))
    ab("vert_down_F4", lambda: sp.sgm_sweep(
        Cv4, None, (0, 1, -1), False, p1=10, p2=120, n_real=1242,
        d_real=128, frames=4))

    # horizontal fwd, F=4 transposed geometry (n_real << N/2), with S_in
    Ct = jnp.asarray(rng.integers(0, 25, (1280, 1504, 128)).astype(np.int8))
    St = jnp.asarray(rng.integers(0, 500, (1280, 1504, 128)).astype(np.int16))
    ab("horiz_fwd_F4_sin", lambda: sp.sgm_sweep(
        Ct, St, (0,), False, p1=10, p2=120, n_real=375, d_real=128))

    rec("total_wall_s", round(time.time() - t0, 1))


if __name__ == "__main__":
    sys.exit(main())
