"""Tests for the golden NumPy oracle itself (SURVEY.md §5.0): unit checks of
each stage against hand-computed values, property tests, synthetic-pair
absolute accuracy, and cross-validation against OpenCV."""

import numpy as np
import pytest

from tpustereo.config import Config
from tpustereo.data.synthetic import synthetic_pair
from tpustereo.eval import bad, d1_all
from tpustereo.golden import (
    aggregate_numpy, census_numpy, cost_volume_numpy, median3_numpy,
    sad_volume_numpy, sgbm_numpy, speckle_numpy, wta_numpy,
)
from tpustereo.golden.sgbm_numpy import aggregate_path_numpy
from tpustereo.golden.opencv_ref import HAVE_CV2, opencv_sgbm


def test_census_bit_layout():
    # 3x3 census, hand-computed: bits row-major excluding center.
    img = np.array([[1, 2, 3],
                    [4, 5, 6],
                    [7, 8, 9]], dtype=np.uint8)
    c = census_numpy(img, (3, 3))
    # center pixel (1,1)=5: neighbours 1,2,3,4,6,7,8,9 -> bits for <5:
    # 1,2,3,4 set (bits 0..3), 6,7,8,9 clear.
    assert c[1, 1] == 0b1111
    # corner (0,0)=1 with edge replication: all neighbours >= 1, none < 1.
    assert c[0, 0] == 0


def test_cost_volume_out_of_range():
    cl = np.zeros((2, 4), dtype=np.uint64)
    cr = np.zeros((2, 4), dtype=np.uint64)
    C = cost_volume_numpy(cl, cr, 4, max_cost=24)
    # x < d -> max cost; else popcount(0^0)=0
    for d in range(4):
        assert (C[:, :d, d] == 24).all()
        assert (C[:, d:, d] == 0).all()


def test_cost_volume_popcount():
    cl = np.array([[0b1011]], dtype=np.uint64)
    cr = np.array([[0b0001]], dtype=np.uint64)
    C = cost_volume_numpy(cl, cr, 1, max_cost=24)
    assert C[0, 0, 0] == 2  # popcount(0b1010)


def test_sgm_single_scanline_hand_computed():
    # 1 row, 3 px, D=3, P1=1, P2=2; direction E (scan left to right).
    C = np.array([[[0, 5, 5], [5, 5, 0], [5, 0, 5]]], dtype=np.uint8)
    cfg = Config(p1=1, p2=2, num_disparities=3, paths=4)
    img = np.zeros((1, 3), dtype=np.uint8)
    L = aggregate_path_numpy(C, 0, 1, cfg, img)
    # x=0: L = C = [0,5,5]
    assert (L[0, 0] == [0, 5, 5]).all()
    # x=1: minprev=0; cand(d0)=min(0, 5+1, inf+1, 0+2)=0 -> 5+0-0=5
    # cand(d1)=min(5, 0+1, 5+1, 2)=1 -> 5+1-0=6
    # cand(d2)=min(5, 5+1, inf, 2)=2 -> 0+2-0=2
    assert (L[0, 1] == [5, 6, 2]).all()
    # x=2: prev=[5,6,2], minprev=2
    # d0: min(5, 6+1, inf, 4)=4 -> 5+4-2=7
    # d1: min(6, 2+1, 5+1, 4)=3 -> 0+3-2=1
    # d2: min(2, inf, 6+1, 4)=2 -> 5+2-2=5
    assert (L[0, 2] == [7, 1, 5]).all()


def test_sgm_bound_property(small_pair):
    # L_r <= C_max + P2 (SURVEY.md §1.1), per path.
    L, R, _, _ = small_pair
    cfg = Config(num_disparities=16, p1=3, p2=20)
    C = cost_volume_numpy(census_numpy(L), census_numpy(R), 16, 24)
    for dy, dx in [(0, 1), (1, 0), (1, 1), (-1, -1)]:
        Lr = aggregate_path_numpy(C, dy, dx, cfg, L)
        assert Lr.max() <= 24 + cfg.p2


def test_sgm_zero_penalty_degenerates_to_wta(small_pair):
    L, R, _, _ = small_pair
    cfg = Config(num_disparities=16, p1=0, p2=0, paths=8,
                 uniqueness_ratio=0, disp12_max_diff=-1,
                 speckle_window_size=0, median_filter=False, subpixel=False)
    C = cost_volume_numpy(census_numpy(L), census_numpy(R), 16, 24)
    S = aggregate_numpy(C, cfg, L)
    # with P1=P2=0 every path cost collapses to the raw cost
    assert (S == 8 * C.astype(np.int32)).all()


def test_horizontal_path_row_permutation_invariance(small_pair):
    L, R, _, _ = small_pair
    cfg = Config(num_disparities=16)
    C = cost_volume_numpy(census_numpy(L), census_numpy(R), 16, 24)
    perm = np.random.default_rng(0).permutation(C.shape[0])
    Lr = aggregate_path_numpy(C, 0, 1, cfg, L)
    Lr_p = aggregate_path_numpy(C[perm], 0, 1, cfg, L[perm])
    assert (Lr[perm] == Lr_p).all()


def test_subpixel_parabola_closed_form():
    # craft S with known parabola: S(d) = (d - 2.3)^2 scaled
    D = 8
    d = np.arange(D, dtype=np.float32)
    S = ((d - 2.3) ** 2 * 100).astype(np.int64)[None, None, :]
    cfg = Config(uniqueness_ratio=0, subpixel=True)
    disp, d_int, valid = wta_numpy(S, cfg)
    assert d_int[0, 0] == 2
    assert abs(disp[0, 0] - 2.3) < 0.02
    assert valid[0, 0]


def test_speckle_crafted_pattern():
    disp = np.zeros((8, 8), dtype=np.float32)
    disp[2:4, 2:4] = 30.0  # island of 4 px, jump > range
    valid = np.ones((8, 8), bool)
    cfg = Config(speckle_window_size=5, speckle_range=2)
    v = speckle_numpy(disp, valid, cfg)
    assert not v[2:4, 2:4].any()
    assert v[0, 0] and v[7, 7]


def test_median3():
    x = np.zeros((5, 5), np.float32)
    x[2, 2] = 100.0  # single outlier removed by median
    assert median3_numpy(x)[2, 2] == 0.0


def test_fill_background_crafted():
    from tpustereo.golden.sgbm_numpy import fill_background_numpy
    d = np.full((3, 6), -1.0, np.float32)
    d[0] = [5, -1, -1, 3, -1, -1]   # gap takes min(5,3)=3; tail holds 3
    d[1] = [-1, -1, 7, -1, -1, -1]  # leading gap holds 7
    out = fill_background_numpy(d)
    assert out[0].tolist() == [5, 3, 3, 3, 3, 3]
    assert out[1].tolist() == [7, 7, 7, 7, 7, 7]
    assert (out[2] == -1).all()  # no valid pixel in the row -> stays invalid


def test_fill_background_jnp_matches_golden(rng):
    import jax.numpy as jnp
    from tpustereo.golden.sgbm_numpy import fill_background_numpy
    from tpustereo.ops import fill_background
    d = rng.uniform(0, 60, (23, 37)).astype(np.float32)
    d[rng.random((23, 37)) < 0.4] = -1.0
    ref = fill_background_numpy(d)
    out = np.asarray(fill_background(jnp.asarray(d)))
    np.testing.assert_array_equal(ref, out)


def test_lr_hits_crafted():
    from tpustereo.golden.sgbm_numpy import lr_hits_numpy
    # d_r = [3, 3]: x=0: d=0 -> |3|>1, no more d in range (x-1<0) => no hit;
    # x=1: d=0 -> |3|>1, d=1 -> |d_r[0]-1|=2>1 => no hit.
    cfg = Config(num_disparities=4, disp12_max_diff=1)
    d_r = np.array([[3, 3]], np.int32)
    assert lr_hits_numpy(d_r, cfg).tolist() == [[False, False]]
    # d_r = [1, 9]: x=1: d=1 -> |d_r[0]-1|=0 => hit; x=0: d=0 -> |1|<=1 hit
    d_r = np.array([[1, 9]], np.int32)
    assert lr_hits_numpy(d_r, cfg).tolist() == [[True, True]]


def test_fill_hirschmuller_crafted():
    from tpustereo.golden.sgbm_numpy import fill_hirschmuller_numpy
    d = np.full((3, 3), -1.0, np.float32)
    d[0] = [1, 2, 3]
    d[2] = [7, 8, 9]
    d[1, 0] = 4.0
    # center pixel (1,1): rays find E:none(-1 at (1,2) then edge... walk
    # continues: (1,2) invalid -> edge => none), W:4, N:2, S:8,
    # SE:9, SW:7, NE:3, NW:1 -> vals sorted [1,2,3,4,7,8,9]
    occ = fill_hirschmuller_numpy(d, np.zeros((3, 3), bool))
    assert occ[1, 1] == 2.0           # second-lowest
    mis = fill_hirschmuller_numpy(d, np.ones((3, 3), bool))
    assert mis[1, 1] == 4.0           # lower median of 7 values
    # pixel (1,2): E none, W 4 (through invalid (1,1)), N 3, S 9, NE/SE
    # out, NW 2, SW 8 -> [2,3,4,8,9]: occlusion 3, mismatch 4
    assert occ[1, 2] == 3.0 and mis[1, 2] == 4.0


def test_lr_hits_jnp_matches_golden(rng):
    import jax.numpy as jnp
    from tpustereo.golden.sgbm_numpy import lr_hits_numpy
    from tpustereo.ops import lr_hits
    cfg = Config(num_disparities=16, disp12_max_diff=1)
    d_r = rng.integers(0, 16, (13, 29)).astype(np.int32)
    ref = lr_hits_numpy(d_r, cfg)
    out = np.asarray(lr_hits(jnp.asarray(d_r), cfg))
    np.testing.assert_array_equal(ref, out)
    cfg2 = Config(num_disparities=8, min_disparity=3, disp12_max_diff=0)
    np.testing.assert_array_equal(
        lr_hits_numpy(d_r, cfg2), np.asarray(lr_hits(jnp.asarray(d_r), cfg2)))


@pytest.mark.slow
def test_fill_hirschmuller_jnp_matches_golden(rng):
    import jax.numpy as jnp
    from tpustereo.golden.sgbm_numpy import fill_hirschmuller_numpy
    from tpustereo.ops import fill_hirschmuller
    d = rng.uniform(0, 60, (23, 37)).astype(np.float32)
    d[rng.random((23, 37)) < 0.45] = -1.0
    mism = rng.random((23, 37)) < 0.5
    ref = fill_hirschmuller_numpy(d, mism)
    out = np.asarray(fill_hirschmuller(jnp.asarray(d), jnp.asarray(mism)))
    np.testing.assert_array_equal(ref, out)
    # fully-invalid map stays fully invalid
    allinv = np.full((5, 7), -1.0, np.float32)
    assert (np.asarray(fill_hirschmuller(jnp.asarray(allinv),
                                         jnp.zeros((5, 7), bool))) == -1).all()


def test_sad_const_pair(const_pair):
    L, R, gt, m = const_pair
    cfg = Config(mode="sad", num_disparities=16, sad_block=9,
                 disp12_max_diff=-1, speckle_window_size=0,
                 median_filter=False)
    disp = sgbm_numpy(L, R, cfg)
    ok = np.abs(disp - 8.0) <= 1.0
    sel = m & (disp >= 0)
    assert ok[sel].mean() > 0.95


def test_sgm_const_pair_exact(const_pair):
    L, R, gt, m = const_pair
    cfg = Config(num_disparities=16, speckle_window_size=20)
    disp = sgbm_numpy(L, R, cfg)
    sel = m & (disp >= 0)
    assert sel.mean() > 0.8
    assert (np.abs(disp - 8.0) <= 1.0)[sel].all()


def test_sgm_slanted_plane_accuracy(small_pair):
    L, R, gt, m = small_pair
    cfg = Config(num_disparities=16, speckle_window_size=20)
    disp = sgbm_numpy(L, R, cfg)
    gtm = np.where(m & (gt > 0), gt, -1).astype(np.float32)
    assert bad(disp, gtm) < 0.10
    assert d1_all(disp, gtm) < 0.08


@pytest.mark.skipif(not HAVE_CV2, reason="cv2 unavailable")
def test_golden_vs_opencv(const_pair):
    L, R, _, m = const_pair
    cfg = Config(num_disparities=16, paths=8, speckle_window_size=20)
    ours = sgbm_numpy(L, R, cfg)
    cv = opencv_sgbm(L, R, cfg)
    both = (ours >= 0) & (cv >= 0) & m
    assert both.mean() > 0.5
    assert (np.abs(ours - cv) <= 1.0)[both].mean() > 0.98
