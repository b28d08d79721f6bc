"""Round-3 TPU batch #30e: production-kernel SWAR config bisect.
Known: axial micro exact at every N up to 1280 (r30d); production sweep
wrong at (T=376, N=1280, dxs 3, n_real=1242) (r30c); production sweep
exact at (T=16, N=64) all dx combos (r30b). Axis-by-axis search."""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r30e_results.json"
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

    def ab(name, T, N, dxs, n_real, reverse=False):
        try:
            C = jnp.asarray(rng.integers(0, 25, (T, N, 128)).astype(np.int8))
            sp.SWEEP_SWAR = True
            jax.clear_caches()
            on = np.asarray(sp.sgm_sweep(C, None, dxs, reverse, p1=10,
                                         p2=120, n_real=n_real, d_real=128))
            sp.SWEEP_SWAR = False
            jax.clear_caches()
            off = np.asarray(sp.sgm_sweep(C, None, dxs, reverse, p1=10,
                                          p2=120, n_real=n_real, d_real=128))
            d = np.abs(on.astype(np.int64) - off.astype(np.int64))
            bad = np.argwhere(d > 0)
            first = bad[0].tolist() if len(bad) else None
            rec(f"ab/{name}", {"n_mismatch": int((d > 0).sum()),
                               "max_abs": int(d.max()),
                               "first_bad_tnd": first})
        except Exception as e:  # noqa: BLE001
            rec(f"error/{name}", repr(e)[:400])
            traceback.print_exc()
        finally:
            sp.SWEEP_SWAR = True
            jax.clear_caches()

    ab("T376_N1280_ax_full", 376, 1280, (0,), 1280)
    ab("T376_N1280_ax_nreal", 376, 1280, (0,), 1242)
    ab("T376_N1280_dp1_full", 376, 1280, (1,), 1280)
    ab("T376_N1280_dm1_full", 376, 1280, (-1,), 1280)
    ab("T16_N1280_dp1_full", 16, 1280, (1,), 1280)
    ab("T376_N64_dp1_full", 376, 64, (1,), 64)
    ab("T376_N128_dp1_full", 376, 128, (1,), 128)
    rec("total_wall_s", round(time.time() - t0, 1))


if __name__ == "__main__":
    sys.exit(main())
