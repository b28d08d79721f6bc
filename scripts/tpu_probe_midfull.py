"""Isolate which stage's program makes the 1500x3000 pipeline compile
pathologically (>2 h server-side in r20 AND r21; the r8-era full pipeline
compiled and ran at 96 ms/frame). Each stage is jitted alone and timed —
compile wall time is the datum; results written incrementally."""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_probe_midfull.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def timed(name, fn):
    t0 = time.time()
    try:
        out = fn()
        out = [o.block_until_ready() for o in
               (out if isinstance(out, (tuple, list)) else [out])]
        rec(f"compile_s/{name}", round(time.time() - t0, 1))
        return out
    except Exception as e:  # noqa: BLE001
        rec(f"error/{name}", f"after {round(time.time() - t0, 1)}s: "
            + repr(e)[:300])
        traceback.print_exc()
        return None


def main():
    import jax
    import jax.numpy as jnp
    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    rec("device", str(jax.devices()[0].device_kind))

    cfg = PRESETS["middlebury_sgm4"]
    H, W, D = 1500, 3000, 128
    L, R, _, _ = synthetic_pair((H, W), disparity=100.0, slope=0.03, seed=10)
    L, R = jnp.asarray(L), jnp.asarray(R)

    from tpustereo.kernels import (census_cost_volume_pallas,
                                   dr_consistency_pallas, median3_pallas,
                                   sgm_select_pallas)

    # stage 1: cost kernel, plain padded form (the pipeline now gates the
    # fused-Ct emission off at Wq=3072: its in-kernel i32 shear temps OOM
    # scoped VMEM there — first probe run, error/cost in this file's log)
    res = timed("cost_plain", lambda: jax.jit(
        lambda l, r: census_cost_volume_pallas(
            l, r, D, cfg.max_census_cost, cfg.census_window,
            padded=True))(L, R))
    if res is None:
        return 0
    (C,) = res

    # stage 2: select (4 sweeps + fused bwd WTA; Ct via transpose kernel)
    sel = timed("sgm_select", lambda: jax.jit(
        lambda c: sgm_select_pallas(c, cfg, L, dims=(H, W, D)))(C))
    if sel is None:
        return 0
    disp, valid, d_r = sel

    # stage 3: LR consistency
    timed("dr_consistency", lambda: jax.jit(
        lambda dr, d: dr_consistency_pallas(dr, d, D,
                                            cfg.disp12_max_diff))(d_r, disp))

    # stage 4: speckle (banded CC + the two 4.5M lax.sorts)
    from tpustereo.ops import speckle
    timed("speckle", lambda: jax.jit(
        lambda d, v: speckle(d, v, cfg))(disp, valid))

    # stage 5: median
    timed("median3", lambda: jax.jit(
        lambda d: median3_pallas(d))(disp))

    rec("done", True)


if __name__ == "__main__":
    sys.exit(main())
