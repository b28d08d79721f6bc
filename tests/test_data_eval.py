"""Tests for data IO, synthetic generator geometry, and eval metrics."""

import os

import numpy as np
import pytest

from tpustereo.config import Config, PRESETS
from tpustereo.data.io import (read_kitti_disparity, read_pfm,
                               write_kitti_disparity, write_pfm,
                               write_image, read_image_gray)
from tpustereo.data.datasets import parse_kitti_odometry_calib, KittiCalib
from tpustereo.data.synthetic import synthetic_pair
from tpustereo.eval import bad, d1_all, end_point_error


def test_synthetic_correspondence():
    """right(y, x - d) must equal left(y, x) for integer shifts."""
    L, R, gt, m = synthetic_pair((32, 48), disparity=5.0, slope=0.0, seed=2)
    assert np.all(gt == 5.0)
    diff = np.abs(L[:, 5:].astype(int) - R[:, :-5].astype(int))
    assert diff.mean() < 2.0  # u8 quantisation only


def test_synthetic_slope_invertibility():
    L, R, gt, m = synthetic_pair((16, 64), disparity=4.0, slope=0.1, seed=3)
    assert gt[0, 0] == pytest.approx(4.0)
    assert gt[0, 63] == pytest.approx(4.0 + 0.1 * 63)
    assert m[:, :4].sum() < m[:, 4:].sum()


def test_pfm_roundtrip(tmp_path):
    d = np.random.default_rng(0).random((9, 13)).astype(np.float32) * 50
    p = str(tmp_path / "d.pfm")
    write_pfm(p, d)
    assert np.allclose(read_pfm(p), d)


def test_kitti_png_roundtrip(tmp_path):
    d = np.random.default_rng(0).random((9, 13)).astype(np.float32) * 50
    d[0, 0] = -1.0  # invalid stays invalid
    p = str(tmp_path / "d.png")
    write_kitti_disparity(p, d)
    rd = read_kitti_disparity(p)
    assert rd[0, 0] == -1.0
    assert np.abs(rd[d > 0] - d[d > 0]).max() < 1 / 128


def test_image_roundtrip(tmp_path):
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8))
    p = str(tmp_path / "i.png")
    write_image(p, img)
    assert (read_image_gray(p) == img).all()


def test_kitti_calib_parse(tmp_path):
    p = str(tmp_path / "calib.txt")
    with open(p, "w") as f:
        f.write("P0: 700 0 600 0 0 700 180 0 0 0 1 0\n")
        f.write("P1: 700 0 600 -380 0 700 180 0 0 0 1 0\n")
    c = parse_kitti_odometry_calib(p)
    assert c.fx == 700 and c.baseline == pytest.approx(380 / 700)
    z = c.depth_from_disparity(np.array([[10.0, -1.0]], np.float32))
    assert z[0, 0] == pytest.approx(700 * c.baseline / 10)
    assert z[0, 1] == 0.0


def test_metrics():
    gt = np.full((10, 10), 20.0, np.float32)
    pred = gt.copy()
    pred[0, :] = 10.0   # error 10 > 3px and > 5% -> D1 bad
    pred[1, :] = -1.0   # invalid prediction -> error
    assert d1_all(pred, gt) == pytest.approx(0.2)
    assert bad(pred, gt, 2.0) == pytest.approx(0.2)
    assert end_point_error(pred, gt) == pytest.approx(10 * 10 / 90)
    gt2 = gt.copy(); gt2[5, :] = -1.0  # unlabeled GT excluded
    assert d1_all(pred, gt2) == pytest.approx(20 / 90)


def test_presets_cover_baseline_configs():
    assert set(PRESETS) == {"tsukuba_sad", "middlebury_census_wta",
                            "middlebury_sgm4", "kitti_sgm8", "kitti_odometry"}
    assert PRESETS["tsukuba_sad"].mode == "sad"
    assert PRESETS["tsukuba_sad"].num_disparities == 64
    assert PRESETS["kitti_sgm8"].paths == 8
    assert PRESETS["middlebury_sgm4"].paths == 4
    assert PRESETS["kittii_odometry" if False else "kitti_odometry"].strips == 2


def test_config_validation():
    with pytest.raises(ValueError):
        Config(paths=3)
    with pytest.raises(ValueError):
        Config(census_window=(4, 5))
    with pytest.raises(ValueError):
        Config(p1=10, p2=5)
    c = Config().replace(num_disparities=64)
    assert c.num_disparities == 64 and c.census_bits == 24
