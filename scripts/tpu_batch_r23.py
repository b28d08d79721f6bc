"""Round-2 TPU batch #23: batched-axis speckle sorts + final headline.

Change under test: `component_big_frames` sorts (F, n) along the last
axis (one lax.sort pair, per-row network depth O(log^2 n)) instead of
sorting the F*n concatenation (depth O(log^2 Fn)) — r22 differencing put
the two sorts at 2.82 ms/frame, ~all of speckle. Also re-records the
five operating-point numbers for BASELINE.md with every measured default
(lax.sort speckle, external transpose, per-direction sweeps, MXU WTA
refinement).
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r23_results.json"
REFS_DIR = "/tmp/r20_refs"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def exact(key, got, want, tol=1e-4):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    d = np.abs(got - want)
    bad = int((d > tol).sum())
    rec(key, {"max_abs": float(d.max()), "n_mismatch": bad,
              "n_px": int(got.size)})
    return bad == 0


def section(name):
    def deco(fn):
        def run(*a, **k):
            try:
                return fn(*a, **k)
            except Exception as e:  # noqa: BLE001
                rec(f"error/{name}", repr(e)[:400])
                traceback.print_exc()
                return None
        return run
    return deco


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm_frames

    kitti = PRESETS["kitti_sgm8"]

    # ---- 1. exactness + headline with batched-axis sorts -------------------
    r4 = np.load(f"{REFS_DIR}/kitti4.npz")
    Ls = jnp.asarray(np.stack([r4[f"L{f}"] for f in range(4)]))
    Rs = jnp.asarray(np.stack([r4[f"R{f}"] for f in range(4)]))
    outs_ref = np.stack([r4[f"out{f}"] for f in range(4)])

    @section("kitti")
    def kitti_sec():
        fused = np.asarray(sgbm_frames(Ls, Rs, kitti))
        exact("exact/kitti_F4_batchedsort_vs_cpu", fused, outs_ref)
        for batch in (16, 8):
            r = run_benchmark(kitti, shape=(375, 1242), batch=batch,
                              iters=20)
            rec(f"bench/kitti_sgm8_F4_b{batch}",
                {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})

    kitti_sec()

    # ---- 2. BASELINE.md operating points (final defaults) ------------------
    @section("presets")
    def presets():
        for name, shape, batch in (
                ("tsukuba_sad", (288, 384), 16),
                ("middlebury_census_wta", (375, 621), 16),
                ("middlebury_sgm4", (375, 1242), 8),
        ):
            cfg = PRESETS[name]
            if name == "middlebury_sgm4":
                cfg = cfg.replace(frames_per_step=4)
            r = run_benchmark(cfg, shape=shape, batch=batch, iters=20)
            rec(f"bench/{name}", {k: r[k] for k in ("value", "ms_per_frame")})
        # 9x7 census (62-bit) variant
        r = run_benchmark(kitti.replace(census_window=(9, 7)),
                          shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_sgm8_9x7",
            {k: r[k] for k in ("value", "ms_per_frame")})
        # true-Middlebury geometries
        cfg_h = PRESETS["middlebury_sgm4"]
        r = run_benchmark(cfg_h, shape=(750, 1500), batch=4, iters=10)
        rec("bench/middlebury_half_750x1500",
            {k: r[k] for k in ("value", "ms_per_frame")})

    presets()

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
