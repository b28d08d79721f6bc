"""Stereo evaluation metrics (SURVEY.md §1.1, §3 #11).

All metrics take float32 disparity maps with invalid = -1 (prediction) and
invalid <= 0 (ground truth), and an optional extra validity mask.
Pixels where the prediction is invalid count as errors (standard KITTI /
Middlebury protocol: missing estimates are penalised, not skipped).
"""

from __future__ import annotations

import numpy as np


def _gt_mask(gt: np.ndarray, mask=None) -> np.ndarray:
    m = gt > 0
    if mask is not None:
        m &= mask
    return m


def d1_all(pred: np.ndarray, gt: np.ndarray, mask=None) -> float:
    """KITTI 2015 D1: fraction of labeled pixels with error > 3 px AND
    > 5 % of the true disparity. Invalid predictions are errors."""
    m = _gt_mask(gt, mask)
    if not m.any():
        return float("nan")
    err = np.abs(pred - gt)
    bad_px = (err > 3.0) & (err > 0.05 * gt)
    bad_px |= pred < 0
    return float(bad_px[m].mean())


def bad(pred: np.ndarray, gt: np.ndarray, thresh: float = 2.0, mask=None) -> float:
    """Middlebury bad-τ: fraction of pixels with |d - d_gt| > τ.
    Invalid predictions are errors."""
    m = _gt_mask(gt, mask)
    if not m.any():
        return float("nan")
    bad_px = (np.abs(pred - gt) > thresh) | (pred < 0)
    return float(bad_px[m].mean())


def end_point_error(pred: np.ndarray, gt: np.ndarray, mask=None) -> float:
    """Mean absolute disparity error over pixels where both are valid."""
    m = _gt_mask(gt, mask) & (pred >= 0)
    if not m.any():
        return float("nan")
    return float(np.abs(pred - gt)[m].mean())
