"""Round-3 TPU batch #30b: bisect the SWAR on-chip mismatch (r30: exact in
interpret everywhere, 1.6% of pixels off by subpixel-size deltas on chip
=> Mosaic-level discrepancy in some op). Tiny sweeps, each compared
against interpret mode of the SAME kernel AND the v32 on-chip sweep."""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r30b_results.json"
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
    T, N, D = 16, 64, 128
    C = jnp.asarray(rng.integers(0, 25, (T, N, D)).astype(np.int8))
    S0 = jnp.asarray(rng.integers(0, 400, (T, N, D)).astype(np.int16))

    def case(name, S_in=None, n_real=N, **kw):
        try:
            sp.SWEEP_SWAR = True
            jax.clear_caches()
            on_chip = np.asarray(sp.sgm_sweep(C, S_in, p1=10, p2=120,
                                              n_real=n_real, d_real=D, **kw))
            interp = np.asarray(sp.sgm_sweep(C, S_in, p1=10, p2=120,
                                             n_real=n_real, d_real=D,
                                             interpret=True, **kw))
            sp.SWEEP_SWAR = False
            jax.clear_caches()
            v32 = np.asarray(sp.sgm_sweep(C, S_in, p1=10, p2=120,
                                          n_real=n_real, d_real=D, **kw))
            rec(f"bisect/{name}",
                {"chip_vs_interp": int((on_chip != interp).sum()),
                 "chip_vs_v32chip": int((on_chip != v32).sum()),
                 "max_abs_interp": int(np.abs(on_chip.astype(np.int32)
                                              - interp.astype(np.int32)).max())})
        except Exception as e:  # noqa: BLE001
            rec(f"error/{name}", repr(e)[:400])
            traceback.print_exc()
        finally:
            sp.SWEEP_SWAR = True
            jax.clear_caches()

    case("axial_fwd", dxs=(0,), reverse=False)
    case("diag_p1_fwd", dxs=(1,), reverse=False)
    case("diag_m1_fwd", dxs=(-1,), reverse=False)
    case("three_fwd", dxs=(0, 1, -1), reverse=False)
    case("three_rev", dxs=(0, 1, -1), reverse=True)
    case("axial_fwd_nreal", dxs=(0,), reverse=False, n_real=N - 6)
    case("three_fwd_nreal", dxs=(0, 1, -1), reverse=False, n_real=N - 6)
    case("axial_fwd_sin", dxs=(0,), reverse=False, S_in=S0)
    case("three_rev_sin", dxs=(0, 1, -1), reverse=True, S_in=S0)
    rec("total_wall_s", round(time.time() - t0, 1))


if __name__ == "__main__":
    sys.exit(main())
