"""Round-2 TPU batch #6: large-geometry postproc attribution.

At 750x1500 the frame is 61.1 ms with select=26.6 ms — ~34 ms of postproc.
Suspects: the two 1.15M-element XLA sorts in component_big, the banded-CC
refinement, dr_consistency, median. This batch times each in context
(config A/Bs) and standalone (sort micros) to direct the next optimisation.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r6_results.json"
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
    from tpustereo.pipeline.sgbm import sgbm

    mb = PRESETS["middlebury_sgm4"]
    H, W = 750, 1500
    L8, R8, _, _ = synthetic_pair((H, W), disparity=80.0, slope=0.02, seed=0)
    L8, R8 = jnp.asarray(L8), jnp.asarray(R8)

    # ---- 1. in-context config A/Bs at 750x1500 ---------------------------
    for name, c2 in [("full", mb),
                     ("full_noLR", mb.replace(disp12_max_diff=-1)),
                     ("full_nospeckle", mb.replace(speckle_window_size=0)),
                     ("full_nomedian", mb.replace(median_filter=False))]:
        ms = _timed_device_loop(
            lambda l, r, c2=c2: sgbm.__wrapped__(l, r, c2),
            L8, R8, iters=5) * 1e3
        rec(f"mb/{name}_ms", round(ms, 3))

    # ---- 2. sort / speckle micros at this size ---------------------------
    rng = np.random.default_rng(0)
    n = H * W
    keys = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    ms = _timed_device_loop(lambda k: jax.lax.sort(k), keys, iters=10) * 1e3
    rec("micro/sort1_1.15M_ms", round(ms, 3))
    ms = _timed_device_loop(
        lambda k: jax.lax.sort((k, idx), num_keys=1)[0], keys,
        iters=10) * 1e3
    rec("micro/sort2_1.15M_ms", round(ms, 3))
    # scatter-set distribute (the sort-free alternative)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    bits = jnp.asarray(rng.integers(0, 2, n, dtype=np.int32))
    ms = _timed_device_loop(
        lambda p: jnp.zeros(n, jnp.int32).at[p].set(
            bits, unique_indices=True, mode="drop"),
        perm, iters=10) * 1e3
    rec("micro/scatter_set_1.15M_ms", round(ms, 3))

    from tpustereo.ops.postproc import component_big, connected_component_labels
    from tpustereo.kernels.cc_pallas import connected_component_labels_pallas
    v = rng.random((H, W)) < 0.7
    conn_h = jnp.asarray(v[:, :-1] & v[:, 1:])
    conn_v = jnp.asarray(v[:-1, :] & v[1:, :])
    ms = _timed_device_loop(
        lambda ch: connected_component_labels_pallas(ch, conn_v),
        conn_h, iters=5) * 1e3
    rec("micro/cc_banded_750x1500_ms", round(ms, 3))
    lab = connected_component_labels_pallas(conn_h, conn_v)
    ms = _timed_device_loop(
        lambda l: component_big(l, 100), lab, iters=5) * 1e3
    rec("micro/component_big_750x1500_ms", round(ms, 3))

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
