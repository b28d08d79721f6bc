"""Round-2 TPU batch #16: where do the remaining 16.2 ms actually go?

r15 ended the speckle-sort-batching line (no gain: sort cost scales with
total elements). Before the next kernel effort, calibrate:
  * cost kernel alone (its r8 'differenced 3.8 ms' attribution predates
    fused-Ct and is suspect — op-count math predicts <1 ms);
  * sgm_select alone (4 sweeps + WTA, the differenced ~11 ms block);
  * lax.sort shapes: one 465K sequence vs band-parallel axis-1 sorts —
    decides whether the overlapped-band component_big (exact by the
    min-row/connectivity band theorem) is worth building.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r16_results.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop
    from tpustereo.kernels import census_cost_volume_pallas, sgm_select_pallas

    kitti = PRESETS["kitti_sgm8"]
    H, W = 375, 1242
    L, R, _, _ = synthetic_pair((H, W), disparity=40.0, slope=0.02, seed=0)
    L, R = jnp.asarray(L), jnp.asarray(R)

    # ---- cost kernel alone ----------------------------------------------
    def cost_both(l):
        C, Ct = census_cost_volume_pallas(l, R, 128, 24, (5, 5), padded=True,
                                          with_transposed=True)
        return C.astype(jnp.int32).sum() + Ct.astype(jnp.int32).sum()

    ms = _timed_device_loop(cost_both, L, iters=20) * 1e3
    rec("micro/cost_kernel_withCt_ms", round(ms, 3))

    def cost_plain(l):
        C = census_cost_volume_pallas(l, R, 128, 24, (5, 5), padded=True)
        return C.astype(jnp.int32).sum()

    ms = _timed_device_loop(cost_plain, L, iters=20) * 1e3
    rec("micro/cost_kernel_plain_ms", round(ms, 3))

    # ---- sgm_select alone (input: precomputed padded frames) -------------
    C, Ct = census_cost_volume_pallas(L, R, 128, 24, (5, 5), padded=True,
                                      with_transposed=True)

    def select(c):
        d, v, dr = sgm_select_pallas(c, kitti, L, dims=(H, W, 128), Ct=Ct)
        return d.sum() + dr.sum()

    ms = _timed_device_loop(select, C, iters=10) * 1e3
    rec("micro/sgm_select_ms", round(ms, 3))

    # ---- sort shape calibration -----------------------------------------
    rng = np.random.default_rng(0)
    n = H * W
    flat = jnp.asarray(rng.integers(0, n, (n,), dtype=np.int32))
    ms = _timed_device_loop(lambda f: jax.lax.sort(f).sum(), flat,
                            iters=10) * 1e3
    rec("micro/sort_1x465k_ms", round(ms, 3))
    for rows, cols in [(4, 124200), (8, 62100), (16, 31050), (375, 1242)]:
        a = jnp.asarray(rng.integers(0, n, (rows, cols), dtype=np.int32))
        ms = _timed_device_loop(
            lambda x: jax.lax.sort(x, dimension=1).sum(), a, iters=10) * 1e3
        rec(f"micro/sort_{rows}x{cols}_ms", round(ms, 3))
    # payload variant at the promising band shape
    a = jnp.asarray(rng.integers(0, n, (8, 62100), dtype=np.int32))
    idx = jnp.broadcast_to(jnp.arange(62100, dtype=np.int32), (8, 62100))
    ms = _timed_device_loop(
        lambda x: jax.lax.sort((x, idx), dimension=1, num_keys=1)[1].sum(),
        a, iters=10) * 1e3
    rec("micro/sort_payload_8x62k_ms", round(ms, 3))

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
