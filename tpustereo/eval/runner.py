"""Evaluation runner (SURVEY.md §4.5): run the pipeline on Middlebury /
KITTI 2015 / synthetic pairs, compute D1-all & bad-2.0, and optionally the
parity delta vs the golden NumPy SGBM and OpenCV StereoSGBM oracles."""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import numpy as np

from tpustereo.config import Config
from tpustereo.eval.metrics import bad, d1_all, end_point_error


def _metrics(pred, gt) -> dict:
    return {"d1_all": round(d1_all(pred, gt), 5),
            "bad_2.0": round(bad(pred, gt, 2.0), 5),
            "bad_1.0": round(bad(pred, gt, 1.0), 5),
            "epe": round(end_point_error(pred, gt), 4)}


def _eval_one(left, right, gt, cfg: Config, name: str,
              compare_golden: bool, compare_opencv: bool) -> dict:
    from tpustereo.api import match_pair
    disp = match_pair(left, right, cfg)
    entry = {"pair": name, "shape": list(left.shape)}
    if gt is not None:
        entry["tpu"] = _metrics(disp, gt)
    if compare_golden:
        from tpustereo.golden import sgbm_numpy
        gdisp = sgbm_numpy(left, right, cfg)
        if gt is not None:
            entry["golden"] = _metrics(gdisp, gt)
        both = (disp >= 0) & (gdisp >= 0)
        entry["tpu_vs_golden_max_abs"] = float(
            np.abs(disp - gdisp)[both].max()) if both.any() else 0.0
    if compare_opencv:
        from tpustereo.golden.opencv_ref import opencv_sgbm, HAVE_CV2
        if HAVE_CV2:
            odisp = opencv_sgbm(left, right, cfg)
            if gt is not None:
                entry["opencv"] = _metrics(odisp, gt)
    return entry


def evaluate(cfg: Config, middlebury: Optional[str] = None,
             kitti2015: Optional[str] = None, kitti_indices: str = "0-9",
             half_res: bool = False, synthetic: bool = False,
             compare_golden: bool = False, compare_opencv: bool = False) -> dict:
    """Returns a structured report; aggregates mean metrics over pairs."""
    pairs: List[dict] = []

    if synthetic or not (middlebury or kitti2015):
        from tpustereo.data.synthetic import synthetic_pair
        import jax
        # full-size pairs on an accelerator; small ones on the 1-vCPU host
        shape = (192, 320) if jax.default_backend() != "cpu" else (96, 160)
        D = cfg.num_disparities
        # keep max true disparity safely inside [0, D): d(x) = d0 + sl*x
        cases = [(0.3 * D, 0.0), (0.25 * D, 0.2 * D / shape[1]),
                 (0.5 * D, 0.3 * D / shape[1])]
        for i, (d0, sl) in enumerate(cases):
            L, R, gt, valid = synthetic_pair(shape, disparity=d0,
                                             slope=sl, seed=i)
            gt_m = np.where(valid & (gt > 0), gt, -1.0)
            pairs.append(_eval_one(L, R, gt_m, cfg, f"synthetic_{i}",
                                   compare_golden, compare_opencv))

    if middlebury:
        from tpustereo.data.datasets import load_middlebury_pair
        L, R, gt = load_middlebury_pair(middlebury, half_res=half_res)
        pairs.append(_eval_one(L, R, gt, cfg, middlebury,
                               compare_golden, compare_opencv))

    if kitti2015:
        from tpustereo.data.datasets import load_kitti2015_pair
        lo, _, hi = kitti_indices.partition("-")
        for idx in range(int(lo), int(hi or lo) + 1):
            L, R, gt = load_kitti2015_pair(kitti2015, idx)
            pairs.append(_eval_one(L, R, gt, cfg, f"kitti2015_{idx:06d}",
                                   compare_golden, compare_opencv))

    report = {"config": dataclasses.asdict(cfg), "pairs": pairs,
              "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S")}
    keyed = [p["tpu"] for p in pairs if "tpu" in p]
    if keyed:
        report["mean"] = {k: round(float(np.mean([m[k] for m in keyed])), 5)
                          for k in keyed[0]}
    return report
