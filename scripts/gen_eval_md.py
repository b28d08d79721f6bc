"""Regenerate EVAL.md at HEAD over the full supported surface
(VERDICT r4 next #3): every preset plus min_disparity, D=256/512, 9x7
census, adaptive-P2 and both fill modes, each with golden deltas on the
synthetic analytic-GT suite (CPU backend — bit-identical to the TPU
pallas pipeline per the on-chip exactness batteries; see BASELINE.md).

Writes EVAL.md and scripts/eval_head.json (the raw reports).
Run: python scripts/gen_eval_md.py
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tpustereo.config import PRESETS  # noqa: E402
from tpustereo.eval.runner import _eval_one, evaluate  # noqa: E402

K = PRESETS["kitti_sgm8"].replace(frames_per_step=1)

# (row name, config, custom shape or None -> runner default)
ROWS = [
    ("tsukuba_sad (D=64, SAD block 9)", PRESETS["tsukuba_sad"], None),
    ("middlebury_census_wta (D=128)", PRESETS["middlebury_census_wta"], None),
    ("middlebury_sgm4 (4-path, D=128)",
     PRESETS["middlebury_sgm4"].replace(frames_per_step=1), None),
    ("kitti_sgm8 (8-path, D=128)", K, None),
    ("kitti_odometry (cfg-5 knobs)",
     PRESETS["kitti_odometry"].replace(strips=1), None),
    ("kitti_sgm8 + min_disparity=16", K.replace(min_disparity=16), None),
    ("kitti_sgm8 + census 9x7 (62-bit)", K.replace(census_window=(9, 7)),
     None),
    ("kitti_sgm8 + adaptive P2", K.replace(adaptive_p2=True), None),
    ("kitti_sgm8 + fill=background", K.replace(fill_mode="background"),
     None),
    ("kitti_sgm8 + fill=hirschmuller",
     K.replace(fill_mode="hirschmuller"), None),
    ("kitti_sgm8 at D=256", K.replace(num_disparities=256), (96, 320)),
    ("kitti_sgm8 at D=512", K.replace(num_disparities=512), (96, 640)),
    ("tsukuba_sad + LR + min_disp=8",
     PRESETS["tsukuba_sad"].replace(disp12_max_diff=1, min_disparity=8),
     None),
]


def custom_eval(cfg, shape):
    from tpustereo.data.synthetic import synthetic_pair
    D = cfg.num_disparities
    pairs = []
    sl = 0.2 * D / shape[1]
    for i, (d0, s) in enumerate([(0.3 * D, 0.0), (0.25 * D, sl),
                                 (0.45 * D, sl)]):
        L, R, gt, valid = synthetic_pair(shape, disparity=d0, slope=s,
                                         seed=i)
        gtm = np.where(valid & (gt > 0), gt, -1.0)
        pairs.append(_eval_one(L, R, gtm, cfg, f"synthetic_{i}", True,
                               False))
    keyed = [p["tpu"] for p in pairs]
    mean = {k: round(float(np.mean([m[k] for m in keyed])), 5)
            for k in keyed[0]}
    return {"pairs": pairs, "mean": mean}


def main():
    out = {}
    t0 = time.time()
    for name, cfg, shape in ROWS:
        t = time.time()
        rep = (custom_eval(cfg, shape) if shape else
               evaluate(cfg, synthetic=True, compare_golden=True))
        delta = max(p["tpu_vs_golden_max_abs"] for p in rep["pairs"])
        out[name] = {"mean": rep["mean"], "golden_max_abs": delta,
                     "pairs": len(rep["pairs"]),
                     "wall_s": round(time.time() - t, 1)}
        print(name, out[name], flush=True)
    with open("scripts/eval_head.json", "w") as f:
        json.dump(out, f, indent=1)
    print("total", round(time.time() - t0, 1), "s")

    lines = [
        "| Operating point | pairs | mean D1-all | mean bad-2.0 | mean EPE"
        " | max |pipeline − golden| |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in out.items():
        m = r["mean"]
        lines.append(
            f"| {name} | {r['pairs']} | {m['d1_all']:.4f} |"
            f" {m['bad_2.0']:.4f} | {m['epe']:.4f} | {r['golden_max_abs']:.1e} |")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
