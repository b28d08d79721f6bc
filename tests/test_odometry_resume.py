"""Failure recovery (SURVEY.md §5.3/§5.4): a run killed mid-sequence and
resumed from its checkpoint must produce the same trajectory as an
uninterrupted run — the pipeline is deterministic on a fixed device, so
equality is exact."""

import numpy as np

from tpustereo.config import Config
from tpustereo.data.datasets import KittiCalib
from tpustereo.data.synthetic import synthetic_pair
from tpustereo.odometry import StereoOdometry


def _frames(n):
    out = []
    for i in range(n):
        L, R, _, _ = synthetic_pair((64, 96), disparity=10.0 + 0.4 * i,
                                    slope=0.0, seed=3)
        out.append((L, R))
    return out


def _cfg():
    return Config(num_disparities=24, speckle_window_size=0,
                  median_filter=False)


CALIB = KittiCalib(fx=400.0, fy=400.0, cx=48.0, cy=32.0, baseline=0.5)


def test_crash_resume_matches_uninterrupted(tmp_path):
    frames = _frames(6)

    straight = StereoOdometry(CALIB, _cfg())
    for L, R in frames:
        straight.step(L, R)

    # "crash" after 3 frames: checkpoint, drop the object, resume
    part = StereoOdometry(CALIB, _cfg())
    for L, R in frames[:3]:
        part.step(L, R)
    ckpt = str(tmp_path / "ckpt.npz")
    part.save(ckpt)
    del part

    resumed = StereoOdometry.resume(ckpt, CALIB, _cfg())
    assert resumed._frames == 3
    for L, R in frames[3:]:
        resumed.step(L, R)

    a, b = straight.trajectory(), resumed.trajectory()
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-5)
