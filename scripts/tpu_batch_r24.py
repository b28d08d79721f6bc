"""Round-2 TPU batch #24: post-revert re-measures (b8, 9x7 census) +
exactness re-check. The b16/b32 kitti and middlebury_sgm4 numbers from
r21 are valid for HEAD (identical code path after the batched-sort
revert); this fills the two configs r23 measured with the slower sorts.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r24_results.json"
REFS_DIR = "/tmp/r20_refs"
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

    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm_frames

    kitti = PRESETS["kitti_sgm8"]
    r4 = np.load(f"{REFS_DIR}/kitti4.npz")
    Ls = jnp.asarray(np.stack([r4[f"L{f}"] for f in range(4)]))
    Rs = jnp.asarray(np.stack([r4[f"R{f}"] for f in range(4)]))
    outs_ref = np.stack([r4[f"out{f}"] for f in range(4)])

    try:
        fused = np.asarray(sgbm_frames(Ls, Rs, kitti))
        d = np.abs(fused.astype(np.float64) - outs_ref.astype(np.float64))
        rec("exact/kitti_F4_vs_cpu", {"max_abs": float(d.max()),
                                      "n_mismatch": int((d > 1e-4).sum())})
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_sgm8_F4_b16",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
        r = run_benchmark(kitti, shape=(375, 1242), batch=8, iters=20)
        rec("bench/kitti_sgm8_F4_b8",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
        r = run_benchmark(kitti.replace(census_window=(9, 7)),
                          shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_sgm8_9x7",
            {k: r[k] for k in ("value", "ms_per_frame")})
    except Exception as e:  # noqa: BLE001
        rec("error/main", repr(e)[:400])
        traceback.print_exc()

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
