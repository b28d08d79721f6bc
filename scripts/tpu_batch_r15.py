"""Round-2 TPU batch #15: cross-frame speckle sorts + speckle split.

Since r13: `speckle_frames` gives F stacked frames ONE component_big sort
set (labels offset per frame). This batch gates exactness of the new
kitti F4 program, measures the headline, and splits speckle in-context
(labels-only vs full speckle as jitted pipeline-shaped programs — the
standalone micro harness OOMs the CC kernel, r14)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r15_results.json"
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
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.ops.postproc import component_big, speckle_labels
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    F = 4
    kitti = PRESETS["kitti_sgm8"].replace(frames_per_step=F)

    # ---- 1. exactness gate: F4 with cross-frame speckle sorts ------------
    pairs = [synthetic_pair((375, 1242), disparity=30.0 + 10 * f, slope=0.02,
                            seed=f) for f in range(F)]
    Ls = jnp.asarray(np.stack([p[0] for p in pairs]))
    Rs = jnp.asarray(np.stack([p[1] for p in pairs]))
    singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], kitti))
                        for f in range(F)])
    out = np.asarray(sgbm_frames(Ls, Rs, kitti))
    n_bad = int((np.abs(out - singles) > 1e-5).sum())
    rec("exact/kitti_F4_crossframe_speckle", {
        "max_abs": float(np.abs(out - singles).max()),
        "n_mismatch_1e5": n_bad, "n_px": int(out.size)})
    if n_bad:
        rec("verdict", "CROSS-FRAME SPECKLE INEXACT")
        return 0

    # ---- 2. headline -----------------------------------------------------
    for batch in (8, 16):
        r = run_benchmark(kitti, shape=(375, 1242), batch=batch, iters=20)
        rec(f"bench/kitti_sgm8_b{batch}",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})

    # ---- 3. in-context speckle split ------------------------------------
    disp = sgbm(Ls[0], Rs[0],
                kitti.replace(speckle_window_size=0, median_filter=False))
    valid = disp >= 0

    def labels_only(d):
        return speckle_labels(d, valid, kitti).sum()

    def full(d):
        lab = speckle_labels(d, valid, kitti)
        return (valid & component_big(lab, kitti.speckle_window_size)).sum()

    ms_l = _timed_device_loop(labels_only, disp, iters=20) * 1e3
    ms_f = _timed_device_loop(full, disp, iters=20) * 1e3
    rec("micro/speckle_labels_ms", round(ms_l, 3))
    rec("micro/speckle_labels_plus_big_ms", round(ms_f, 3))
    rec("micro/component_big_delta_ms", round(ms_f - ms_l, 3))

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
