#!/usr/bin/env python
"""Headline benchmark — SGM 8-path full pipeline, KITTI 2015 geometry
(1242×375, D=128), frames/s/chip (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps/chip", "vs_baseline": N}
vs_baseline is against the measured OpenCV CPU proxy (2.72 fps, BASELINE.md —
the reference publishes no numbers and its checkout is empty, SURVEY.md §0/§6).

Run on the real TPU chip; honest timing: warmup compile excluded,
block_until_ready inside the timed loop.
"""

import json
import time
import sys

import numpy as np

BASELINE_FPS = 2.72  # OpenCV StereoSGBM MODE_HH, 1 CPU thread (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.pipeline import sgbm_batched
    from tpustereo.data.synthetic import synthetic_pair

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    H, W = 375, 1242
    cfg = PRESETS["kitti_sgm8"].replace(batch_size=batch)

    L, R, _, _ = synthetic_pair((H, W), disparity=40.0, slope=0.02, seed=0)
    lefts = jnp.asarray(np.stack([L] * batch))
    rights = jnp.asarray(np.stack([R] * batch))

    out = sgbm_batched(lefts, rights, cfg)  # warmup + compile
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = sgbm_batched(lefts, rights, cfg)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    print(json.dumps({
        "metric": "SGM 8-path full pipeline fps/chip (KITTI 1242x375, D=128)",
        "value": round(fps, 3),
        "unit": "fps/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
