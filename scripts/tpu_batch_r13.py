"""Round-2 TPU batch #13: combine the validated optimisations, final table.

Inputs (all proven on chip):
  * r10: native popcount exact for the 5x5 census (2-plane run OOMed the
    old fused-Ct variant before testing; now gated off at HEAD, re-tested
    here);
  * r11: fused-Ct + frame stacking exact; F=4 fastest (62.2 fps b8 kitti,
    81.3 fps b8 middlebury_sgm4).
This batch: native popcount ON process-wide, combined exactness gates
(kitti F4, 9x7 single-frame on the gated path, census_wta F4, SAD with the
new gather-free volume), then the final sweep + speckle/median cost
differencing at the winning config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r13_results.json"
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
    cost_pallas.POPCOUNT_IMPL = "native"  # r10: exact on chip (5x5)
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    F = 4
    kitti = PRESETS["kitti_sgm8"].replace(frames_per_step=F)
    mb = PRESETS["middlebury_sgm4"]

    def gate(tag, out, ref):
        n_bad = int((np.abs(out - ref) > 1e-5).sum())
        rec(f"exact/{tag}", {"max_abs": float(np.abs(out - ref).max()),
                             "n_mismatch_1e5": n_bad, "n_px": int(out.size)})
        return n_bad == 0

    # ---- 1. combined exactness gates -------------------------------------
    pairs = [synthetic_pair((375, 1242), disparity=30.0 + 10 * f, slope=0.02,
                            seed=f) for f in range(F)]
    Ls = jnp.asarray(np.stack([p[0] for p in pairs]))
    Rs = jnp.asarray(np.stack([p[1] for p in pairs]))
    singles = np.stack([
        np.asarray(sgbm(Ls[f], Rs[f], kitti.replace(backend="jnp")))
        for f in range(F)])
    ok = gate("kitti_F4_native", np.asarray(sgbm_frames(Ls, Rs, kitti)),
              singles)
    if not ok:
        rec("verdict", "COMBINED CONFIG INEXACT — keep swar/F1 defaults")
        return 0

    c97 = PRESETS["kitti_sgm8"].replace(census_window=(9, 7))
    gate("kitti_9x7_gatedCt_native",
         np.asarray(sgbm(Ls[0], Rs[0], c97)),
         np.asarray(sgbm(Ls[0], Rs[0], c97.replace(backend="jnp"))))

    sad = PRESETS["tsukuba_sad"]
    Lt, Rt, _, _ = synthetic_pair((288, 384), disparity=20.0, slope=0.02,
                                  seed=3)
    Lt, Rt = jnp.asarray(Lt), jnp.asarray(Rt)
    gate("tsukuba_sad_shear", np.asarray(sgbm(Lt, Rt, sad)),
         np.asarray(sgbm(Lt, Rt, sad.replace(backend="jnp"))))

    cw = PRESETS["middlebury_census_wta"]
    cpairs = [synthetic_pair((375, 621), disparity=25.0 + 5 * f, slope=0.02,
                             seed=10 + f) for f in range(F)]
    Lc = jnp.asarray(np.stack([p[0] for p in cpairs]))
    Rc = jnp.asarray(np.stack([p[1] for p in cpairs]))
    cw_ok = gate("census_wta_F4",
                 np.asarray(sgbm_frames(Lc, Rc, cw)),
                 np.stack([np.asarray(sgbm(Lc[f], Rc[f], cw))
                           for f in range(F)]))

    # ---- 2. final sweep --------------------------------------------------
    for batch in (8, 16):
        r = run_benchmark(kitti, shape=(375, 1242), batch=batch, iters=20)
        rec(f"bench/kitti_sgm8_b{batch}_final",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    # differenced postproc attribution at the final config
    r = run_benchmark(kitti.replace(speckle_window_size=0),
                      shape=(375, 1242), batch=8, iters=20)
    rec("bench/kitti_b8_nospeckle",
        {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(kitti.replace(median_filter=False), shape=(375, 1242),
                      batch=8, iters=20)
    rec("bench/kitti_b8_nomedian",
        {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(kitti.replace(disp12_max_diff=-1), shape=(375, 1242),
                      batch=8, iters=20)
    rec("bench/kitti_b8_noLR", {k: r[k] for k in ("value", "ms_per_frame")})

    r = run_benchmark(mb.replace(frames_per_step=F), shape=(375, 1242),
                      batch=8, iters=15)
    rec("bench/middlebury_sgm4_b8_final",
        {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(mb.replace(frames_per_step=2), shape=(750, 1500),
                      batch=2, iters=5)
    rec("bench/middlebury_half_750x1500_final",
        {k: r[k] for k in ("value", "ms_per_frame")})

    for batch in (1, 8):
        r = run_benchmark(sad, shape=(288, 384), batch=batch, iters=15)
        rec(f"bench/tsukuba_sad_b{batch}",
            {k: r[k] for k in ("value", "ms_per_frame")})
    if cw_ok:
        cw = cw.replace(frames_per_step=F)
    r = run_benchmark(cw, shape=(375, 621), batch=8, iters=15)
    rec("bench/census_wta_b8", {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(c97, shape=(375, 1242), batch=1, iters=15)
    rec("bench/kitti_9x7_b1", {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
