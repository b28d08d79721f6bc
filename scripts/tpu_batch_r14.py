"""Round-2 TPU batch #14: speckle decomposition micros.

r13 differencing: speckle = 2.72 ms of the 16.14 ms kitti frame (17%);
median 0.10, LR 0.25. This batch splits speckle into its parts — conn
masks, CC label kernel, component_big (sort + run-length + payload-free
distribute sort) and raw lax.sort calibration — each timed inside one XLA
program (`_timed_device_loop`), so the split decides whether the next
kernel effort goes at the CC iterations or at replacing the sorts.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r14_results.json"
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
    from tpustereo.ops.postproc import component_big, speckle
    from tpustereo.kernels.cc_pallas import connected_component_labels_pallas
    from tpustereo.pipeline.sgbm import sgbm

    kitti = PRESETS["kitti_sgm8"]
    H, W = 375, 1242
    L, R, _, _ = synthetic_pair((H, W), disparity=40.0, slope=0.02, seed=0)
    disp = sgbm(jnp.asarray(L), jnp.asarray(R),
                kitti.replace(speckle_window_size=0, median_filter=False))
    valid = disp >= 0

    ms = _timed_device_loop(
        lambda d: speckle(d, valid, kitti), disp, iters=20) * 1e3
    rec("micro/speckle_full_ms", round(ms, 3))

    rng = jnp.float32(kitti.speckle_range)
    conn_h = valid[:, :-1] & valid[:, 1:] & (
        jnp.abs(disp[:, :-1] - disp[:, 1:]) <= rng)
    conn_v = valid[:-1, :] & valid[1:, :] & (
        jnp.abs(disp[:-1, :] - disp[1:, :]) <= rng)

    def conn_only(d):
        ch = valid[:, :-1] & valid[:, 1:] & (jnp.abs(d[:, :-1] - d[:, 1:]) <= rng)
        cv = valid[:-1, :] & valid[1:, :] & (jnp.abs(d[:-1, :] - d[1:, :]) <= rng)
        return ch.sum() + cv.sum()

    ms = _timed_device_loop(conn_only, disp, iters=20) * 1e3
    rec("micro/conn_masks_ms", round(ms, 3))

    ms = _timed_device_loop(
        lambda ch: connected_component_labels_pallas(ch, conn_v),
        conn_h, iters=20) * 1e3
    rec("micro/cc_labels_ms", round(ms, 3))

    lab = connected_component_labels_pallas(conn_h, conn_v)
    ms = _timed_device_loop(
        lambda lb: component_big(lb, kitti.speckle_window_size),
        lab, iters=20) * 1e3
    rec("micro/component_big_ms", round(ms, 3))

    # raw sort calibration at n = H*W
    flat = lab.reshape(-1)
    idx = jnp.arange(flat.size, dtype=jnp.int32)
    ms = _timed_device_loop(lambda f: jax.lax.sort(f), flat, iters=20) * 1e3
    rec("micro/sort_single_465k_ms", round(ms, 3))
    ms = _timed_device_loop(
        lambda f: jax.lax.sort((f, idx), num_keys=1)[0], flat,
        iters=20) * 1e3
    rec("micro/sort_payload_465k_ms", round(ms, 3))

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
