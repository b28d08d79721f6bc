"""Round-2 TPU batch #18: A/B the two new kernels at full geometry.

r17 gates exactness vs the jnp reference; this batch quantifies each
change in isolation ON CHIP (pallas-vs-pallas, so no slow jnp compiles):
  * EMIT_TRANSPOSED on/off at KITTI F4 — exactness of the fused rank-4
    layout against sweep+tile-transpose, and the transpose's ms cost;
  * bitonic vs lax.sort component_big inside pipeline-shaped speckle
    programs (the r17 standalone micros carry measurement tax);
  * headline re-check at the winning settings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r18_results.json"
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
    import tpustereo.kernels.sgm_pallas as sgm_pallas
    import tpustereo.kernels.bitonic_pallas as bitonic_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm_frames

    F = 4
    kitti = PRESETS["kitti_sgm8"]  # preset already carries F=4
    pairs = [synthetic_pair((375, 1242), disparity=30.0 + 10 * f, slope=0.02,
                            seed=f) for f in range(F)]
    Ls = jnp.asarray(np.stack([p[0] for p in pairs]))
    Rs = jnp.asarray(np.stack([p[1] for p in pairs]))

    # ---- 1. EMIT_TRANSPOSED A/B: exactness + frame cost ------------------
    out_fused = np.asarray(sgbm_frames(Ls, Rs, kitti))
    sgm_pallas.EMIT_TRANSPOSED = False
    jax.clear_caches()
    out_ext = np.asarray(sgbm_frames(Ls, Rs, kitti))
    bad = int((np.abs(out_fused - out_ext) > 1e-5).sum())
    rec("exact/emit_t_fused_vs_external", {
        "max_abs": float(np.abs(out_fused - out_ext).max()),
        "n_mismatch": bad, "n_px": int(out_fused.size)})
    r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
    rec("bench/kitti_F4_b16_EXTERNAL_transpose",
        {k: r[k] for k in ("value", "ms_per_frame")})
    sgm_pallas.EMIT_TRANSPOSED = True
    jax.clear_caches()
    r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
    rec("bench/kitti_F4_b16_FUSED",
        {k: r[k] for k in ("value", "ms_per_frame")})

    # ---- 2. bitonic vs lax component_big, pipeline-shaped ----------------
    from tpustereo.config import Config
    from tpustereo.ops.postproc import speckle_frames
    from tpustereo.pipeline.sgbm import sgbm

    d1 = sgbm(Ls[0], Rs[0],
              kitti.replace(frames_per_step=1, speckle_window_size=0,
                            median_filter=False))
    disp = jnp.broadcast_to(d1, (F,) + d1.shape)
    valid = disp >= 0

    def spk(d):
        return speckle_frames(d, valid, kitti).sum()

    ms = _timed_device_loop(spk, disp, iters=20) * 1e3
    rec("micro/speckle_frames_bitonic_ms_per4", round(ms, 3))

    real_feasible = bitonic_pallas.bitonic_feasible
    bitonic_pallas.bitonic_feasible = lambda *a, **k: False
    jax.clear_caches()
    ms = _timed_device_loop(spk, disp, iters=20) * 1e3
    rec("micro/speckle_frames_laxsort_ms_per4", round(ms, 3))
    bitonic_pallas.bitonic_feasible = real_feasible

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
