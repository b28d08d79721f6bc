"""OpenCV StereoSGBM/StereoBM adapters — level-2 oracle (SURVEY.md §5.0).

OpenCV uses a Birchfield–Tomasi cost (not census), so agreement with our
pipeline is expected at the disparity-map / metric level (bad-pixel bounds),
not per-stage. These adapters normalise OpenCV's int16 disparity*16 output to
our float32 / invalid=-1 convention.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    HAVE_CV2 = True
except ImportError:  # pragma: no cover
    HAVE_CV2 = False

from tpustereo.config import Config
from tpustereo.golden.sgbm_numpy import INVALID


def _norm(raw: np.ndarray, min_disparity: int) -> np.ndarray:
    disp = raw.astype(np.float32) / 16.0
    disp[raw < min_disparity * 16] = INVALID
    return disp


def opencv_sgbm(left: np.ndarray, right: np.ndarray, cfg: Config) -> np.ndarray:
    """cv2.StereoSGBM; MODE_HH for 8-path parity, MODE_SGBM for 5-path."""
    assert HAVE_CV2, "cv2 not available"
    mode = cv2.STEREO_SGBM_MODE_HH if cfg.paths == 8 else cv2.STEREO_SGBM_MODE_SGBM
    m = cv2.StereoSGBM.create(
        minDisparity=cfg.min_disparity,
        numDisparities=cfg.num_disparities,
        blockSize=5,
        P1=8 * 25,
        P2=32 * 25,
        disp12MaxDiff=cfg.disp12_max_diff,
        uniquenessRatio=cfg.uniqueness_ratio,
        speckleWindowSize=cfg.speckle_window_size,
        speckleRange=cfg.speckle_range,
        mode=mode,
    )
    # NB cv2 5.0 compute() signature: compute(left, right) -> disparity
    raw = m.compute(left, right)
    return _norm(raw, cfg.min_disparity)


def opencv_bm(left: np.ndarray, right: np.ndarray, cfg: Config) -> np.ndarray:
    """cv2.StereoBM (SAD block matching) for config-1 parity."""
    assert HAVE_CV2, "cv2 not available"
    m = cv2.StereoBM.create(numDisparities=cfg.num_disparities,
                            blockSize=cfg.sad_block)
    raw = m.compute(left, right)
    return _norm(raw, cfg.min_disparity)
