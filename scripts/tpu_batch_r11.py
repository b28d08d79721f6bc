"""Round-2 TPU batch #11: fused transposed-cost emission + frame stacking.

Two new structural optimisations since batch #9/#10:
  * the cost kernel now emits the horizontal-sweep layout Ct directly
    (second output, rank-4 reshape trick) — the standalone C transpose
    kernel is gone from the fused SGM path;
  * sgbm_frames stacks F frames through one set of kernel launches
    (vertical sweeps reset carries at frame seams; horizontal sweeps get
    F-fold fatter slabs, attacking their per-op issue overhead).

Both are bit-exact in interpret mode; this batch decides on-chip
exactness (Mosaic relayouts/rank-4 blocks are exactly the class interpret
cannot certify) and measures the payoff. Exactness gates first: if the
stacked path is wrong on chip, the bench rows still identify the fastest
SAFE configuration for bench.py.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r11_results.json"
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
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    kitti = PRESETS["kitti_sgm8"]
    mb = PRESETS["middlebury_sgm4"]

    # ---- 1. on-chip exactness: fused-Ct single-frame path ----------------
    L, R, _, _ = synthetic_pair((375, 1242), disparity=40.0, slope=0.02,
                                seed=0)
    L, R = jnp.asarray(L), jnp.asarray(R)
    out_pal = np.asarray(sgbm(L, R, kitti))
    out_jnp = np.asarray(sgbm(L, R, kitti.replace(backend="jnp")))
    diff = np.abs(out_pal - out_jnp)
    rec("exact/kitti_sgm8_fusedCt", {
        "max_abs": float(diff.max()),
        "n_mismatch_1e5": int((diff > 1e-5).sum()),
        "n_px": int(diff.size),
    })

    # ---- 2. on-chip exactness: frame stacking ----------------------------
    pairs = [synthetic_pair((375, 1242), disparity=30.0 + 10 * f, slope=0.02,
                            seed=f) for f in range(4)]
    Ls = jnp.asarray(np.stack([p[0] for p in pairs]))
    Rs = jnp.asarray(np.stack([p[1] for p in pairs]))
    singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], kitti))
                        for f in range(4)])
    ok_frames = {}
    for F in (2, 4):
        stacked = np.asarray(sgbm_frames(Ls[:F], Rs[:F], kitti))
        n_bad = int((np.abs(stacked - singles[:F]) > 1e-5).sum())
        ok_frames[F] = n_bad == 0
        rec(f"exact/kitti_sgm8_frames{F}", {
            "max_abs": float(np.abs(stacked - singles[:F]).max()),
            "n_mismatch_1e5": n_bad,
            "n_px": int(stacked.size),
        })

    # ---- 3. benches ------------------------------------------------------
    r = run_benchmark(kitti, shape=(375, 1242), batch=8, iters=20)
    rec("bench/kitti_sgm8_b8_F1",
        {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    for F in (2, 4):
        if not ok_frames[F]:
            rec(f"bench/kitti_sgm8_b8_F{F}", "SKIPPED: inexact on chip")
            continue
        r = run_benchmark(kitti.replace(frames_per_step=F),
                          shape=(375, 1242), batch=8, iters=20)
        rec(f"bench/kitti_sgm8_b8_F{F}",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    # 4-path preset with the winning F (vertical sweeps K=1: more VMEM room)
    if ok_frames[4]:
        r = run_benchmark(mb.replace(frames_per_step=4), shape=(375, 1242),
                          batch=8, iters=15)
        rec("bench/middlebury_sgm4_b8_F4",
            {k: r[k] for k in ("value", "ms_per_frame")})
    r = run_benchmark(mb, shape=(375, 1242), batch=1, iters=15)
    rec("bench/middlebury_sgm4_b1",
        {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
