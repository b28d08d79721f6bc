"""Parity tests: jnp ops vs the golden NumPy oracle — bit-exact on integer
stages, fp-tight end-to-end (SURVEY.md §5.0 'golden parity tests')."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpustereo.config import Config
from tpustereo import golden
from tpustereo.ops import (aggregate, census, cost_volume, lr_check, median3,
                           sad_volume, speckle, wta)
from tpustereo.ops.sgm import aggregate_path
from tpustereo.pipeline import sgbm, sgbm_batched
from tpustereo.api import match_pair, match_batch
from tpustereo.data.synthetic import synthetic_pair


CFG = Config(num_disparities=16, speckle_window_size=20)


@pytest.fixture(scope="module")
def pair():
    return synthetic_pair((48, 64), disparity=6.0, slope=0.05, seed=7)


@pytest.fixture(scope="module")
def vol(pair):
    L, R, _, _ = pair
    C = golden.cost_volume_numpy(golden.census_numpy(L), golden.census_numpy(R),
                                 CFG.num_disparities, 24)
    return L, R, C


def test_census_parity(pair):
    L, _, _, _ = pair
    for window in [(5, 5), (3, 3), (5, 3)]:
        g = golden.census_numpy(L, window)
        j = np.asarray(census(jnp.asarray(L), window))
        assert j.shape[-1] == 1 and (g == j[..., 0].astype(np.uint64)).all()


def test_census_multiplane(pair):
    # 9x7 window -> 62 bits -> 2 uint32 planes
    L, _, _, _ = pair
    g = golden.census_numpy(L, (9, 7))
    j = np.asarray(census(jnp.asarray(L), (9, 7)))
    assert j.shape[-1] == 2
    packed = j[..., 0].astype(np.uint64) | (j[..., 1].astype(np.uint64) << np.uint64(32))
    assert (g == packed).all()


def test_cost_volume_parity(pair, vol):
    L, R, C = vol[0], vol[1], vol[2]
    j = np.asarray(cost_volume(census(jnp.asarray(L)), census(jnp.asarray(R)),
                               CFG.num_disparities, 24))
    assert (C == j).all()


def test_sad_parity(pair):
    L, R, _, _ = pair
    g = golden.sad_volume_numpy(L, R, 16, 9)
    j = np.asarray(sad_volume(jnp.asarray(L), jnp.asarray(R), 16, 9))
    assert (g == j).all()


@pytest.mark.parametrize("dy,dx", [(0, 1), (0, -1), (1, 0), (-1, 0),
                                   (1, 1), (1, -1), (-1, 1), (-1, -1)])
def test_aggregate_path_parity(vol, dy, dx):
    L, _, C = vol
    g = golden.aggregate_path_numpy(C, dy, dx, CFG, L)
    j = np.asarray(aggregate_path(jnp.asarray(C), dy, dx, CFG, jnp.asarray(L)))
    assert (g == j).all(), f"direction {(dy, dx)}"


@pytest.mark.parametrize("adaptive", [False, True])
@pytest.mark.parametrize("paths", [4, 8])
def test_aggregate_parity(vol, paths, adaptive):
    L, _, C = vol
    cfg = CFG.replace(paths=paths, adaptive_p2=adaptive)
    g = golden.aggregate_numpy(C, cfg, L)
    j = np.asarray(aggregate(jnp.asarray(C), cfg, jnp.asarray(L)))
    assert (g == j).all()


def test_wta_parity(vol):
    L, _, C = vol
    S = golden.aggregate_numpy(C, CFG, L)
    gd, gi, gv = golden.wta_numpy(S, CFG)
    jd, ji, jv = wta(jnp.asarray(S), CFG)
    assert (gi == np.asarray(ji)).all()
    assert (gv == np.asarray(jv)).all()
    assert np.abs(gd - np.asarray(jd)).max() < 1e-4


def test_lr_check_parity(vol):
    L, _, C = vol
    S = golden.aggregate_numpy(C, CFG, L)
    gd, gi, _ = golden.wta_numpy(S, CFG)
    g = golden.lr_check_numpy(S, gi, gd, CFG)
    j = np.asarray(lr_check(jnp.asarray(S), jnp.asarray(gd), CFG))
    assert (g == j).all()


@pytest.mark.slow
def test_speckle_parity(pair):
    L, R, _, _ = pair
    gd, stages = golden.sgbm_numpy(L, R, CFG, return_stages=True)
    disp, _, _ = stages["wta"]
    valid = stages["lr_valid"]
    g = golden.speckle_numpy(disp, valid, CFG)
    j = np.asarray(speckle(jnp.asarray(disp), jnp.asarray(valid), CFG))
    assert (g == j).all()


def test_component_big_matches_sizes(rng):
    # component_big's packed payload-free distribute sort must equal the
    # full component_sizes >= thresh at every threshold
    from tpustereo.ops.postproc import (component_big, component_sizes,
                                        connected_component_labels)
    v = rng.random((24, 40)) < 0.6
    conn_h = jnp.asarray(v[:, :-1] & v[:, 1:])
    conn_v = jnp.asarray(v[:-1, :] & v[1:, :])
    lab = connected_component_labels(conn_h, conn_v)
    sizes = np.asarray(component_sizes(lab))
    for thresh in (1, 3, 10, 100):
        big = np.asarray(component_big(lab, thresh))
        assert (big == (sizes >= thresh)).all()


def test_component_big_scatter_distribute_parity(rng, monkeypatch):
    # the single-sort (inverse-permutation scatter) distribute variant must
    # equal the default payload-free second sort bit-for-bit
    import tpustereo.ops.postproc as pp
    v = rng.random((24, 40)) < 0.6
    conn_h = jnp.asarray(v[:, :-1] & v[:, 1:])
    conn_v = jnp.asarray(v[:-1, :] & v[1:, :])
    lab = pp.connected_component_labels(conn_h, conn_v)
    for thresh in (3, 25):
        want = np.asarray(pp.component_big(lab, thresh))
        monkeypatch.setattr(pp, "SCATTER_DISTRIBUTE", True)
        got = np.asarray(pp.component_big(lab, thresh))
        monkeypatch.setattr(pp, "SCATTER_DISTRIBUTE", False)
        assert (got == want).all()


@pytest.mark.slow
def test_speckle_worst_case_snake():
    # a long thin valid snake: must NOT be invalidated (component is big);
    # regression test for naive fixed-iteration label propagation.
    H, W = 16, 40
    disp = np.zeros((H, W), np.float32)
    valid = np.zeros((H, W), bool)
    valid[0, :] = True; valid[1:, -1] = True  # L-shaped thin region, 55 px
    cfg = Config(speckle_window_size=50, speckle_range=2)
    g = golden.speckle_numpy(disp, valid, cfg)
    j = np.asarray(speckle(jnp.asarray(disp), jnp.asarray(valid), cfg))
    assert (g == j).all()
    assert j[0, 0] and j[H - 1, W - 1]  # kept


@pytest.mark.slow
def test_speckle_hilbert_component(rng):
    # ADVICE r1 (high): a high-bend component (order-4 Hilbert path, ~190
    # bends on a 32x32 grid) must converge to ONE label — the old H+W
    # iteration cap silently fragmented it and speckle-killed the pieces.
    from tests.conftest import hilbert_path_mask
    from tpustereo.ops.postproc import connected_component_labels
    valid = hilbert_path_mask(4)           # (32, 32), 511-px thin component
    H, W = valid.shape
    disp = np.zeros((H, W), np.float32)
    cfg = Config(speckle_window_size=300, speckle_range=2)
    g = golden.speckle_numpy(disp, valid, cfg)
    j = np.asarray(speckle(jnp.asarray(disp), jnp.asarray(valid), cfg))
    assert (g == j).all()
    assert j[valid].all()                  # component kept (511 >= 300)
    conn_h = valid[:, :-1] & valid[:, 1:]
    conn_v = valid[:-1, :] & valid[1:, :]
    lab = np.asarray(connected_component_labels(jnp.asarray(conn_h),
                                                jnp.asarray(conn_v)))
    assert np.unique(lab[valid]).size == 1


def test_wta_lr_large_disparity_count(rng):
    # ADVICE r1 (medium): packed argmin / LR packing exact beyond D=256
    H, W, D = 12, 48, 320
    S = rng.integers(0, 500, (H, W, D)).astype(np.int32)
    cfg = Config(num_disparities=D, subpixel=True, uniqueness_ratio=10,
                 disp12_max_diff=1)
    gd, gi, gv = golden.wta_numpy(S, cfg)
    jd, ji, jv = wta(jnp.asarray(S), cfg)
    assert (gi == np.asarray(ji)).all()
    assert (gv == np.asarray(jv)).all()
    assert np.abs(gd - np.asarray(jd)).max() < 1e-4
    g = golden.lr_check_numpy(S, gi, gd, cfg)
    j = np.asarray(lr_check(jnp.asarray(S), jnp.asarray(gd), cfg))
    assert (g == j).all()


def test_config_rejects_oversized_d():
    with pytest.raises(ValueError):
        Config(num_disparities=2048)
    with pytest.raises(ValueError):
        Config(min_disparity=-1)


@pytest.mark.parametrize("mode", ["sad", "census_wta", "sgm"])
def test_min_disparity_pipeline_parity(pair, mode):
    # VERDICT r1: min_disparity was a dead knob (only the OpenCV adapter
    # consumed it). Now the search window is [min_d, min_d + D) end to end.
    L, R, _, _ = pair  # true disparity ~6..9 px
    kw = dict(mode=mode, num_disparities=12, min_disparity=3)
    if mode == "sgm":
        cfg = Config(speckle_window_size=20, **kw)
    else:
        cfg = Config(disp12_max_diff=-1, speckle_window_size=0,
                     median_filter=False, **kw)
    g = golden.sgbm_numpy(L, R, cfg)
    j = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    assert ((g >= 0) == (j >= 0)).all()
    sel = g >= 0
    assert np.abs(g - j)[sel].max() < 1e-4
    assert (j[j >= 0] >= cfg.min_disparity - 0.5).all()
    # and the offset window actually matters: most valid pixels land near
    # the true ~6-9 px disparities, not at the window floor
    assert np.median(j[j >= 0]) > 4.0


def test_median3_parity(pair):
    L, _, _, _ = pair
    x = L.astype(np.float32)
    assert (golden.median3_numpy(x) == np.asarray(median3(jnp.asarray(x)))).all()


@pytest.mark.parametrize("mode", ["sad", "census_wta", "sgm"])
def test_pipeline_parity(pair, mode):
    L, R, _, _ = pair
    cfg = CFG.replace(mode=mode) if mode == "sgm" else Config(
        mode=mode, num_disparities=16, disp12_max_diff=-1,
        speckle_window_size=0, median_filter=False)
    g = golden.sgbm_numpy(L, R, cfg)
    j = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    assert ((g >= 0) == (j >= 0)).all()
    sel = g >= 0
    assert np.abs(g - j)[sel].max() < 1e-4


@pytest.mark.slow
def test_pipeline_parity_fill_background(pair):
    # gap filling replaces the invalid marker, so compare values everywhere
    L, R, _, _ = pair
    cfg = CFG.replace(fill_mode="background")
    g = golden.sgbm_numpy(L, R, cfg)
    j = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    assert ((g >= 0) == (j >= 0)).all()
    sel = g >= 0
    assert np.abs(g - j)[sel].max() < 1e-4
    # filling must strictly reduce the invalid count on this noisy pair
    base = golden.sgbm_numpy(L, R, CFG)
    assert (g < 0).sum() < (base < 0).sum()


def test_pipeline_parity_fill_hirschmuller(pair):
    L, R, _, _ = pair
    cfg = CFG.replace(fill_mode="hirschmuller")
    g = golden.sgbm_numpy(L, R, cfg)
    j = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    assert ((g >= 0) == (j >= 0)).all()
    sel = g >= 0
    assert np.abs(g - j)[sel].max() < 1e-4
    base = golden.sgbm_numpy(L, R, CFG)
    assert (g < 0).sum() < (base < 0).sum()


def test_batched_matches_single(pair):
    L, R, _, _ = pair
    lefts = np.stack([L, L[::-1]]); rights = np.stack([R, R[::-1]])
    b = match_batch(lefts, rights, CFG)
    s0 = match_pair(L, R, CFG)
    s1 = match_pair(L[::-1], R[::-1], CFG)
    assert np.allclose(b[0], s0) and np.allclose(b[1], s1)


def test_api_accepts_rgb_and_float(pair):
    L, R, _, _ = pair
    rgb = np.stack([L, L, L], axis=-1).astype(np.float64)
    d1 = match_pair(rgb, np.stack([R, R, R], -1), CFG)
    d2 = match_pair(L, R, CFG)
    assert d1.shape == d2.shape


@pytest.mark.parametrize("lr", [-1, 1])
def test_census_wta_fused_frame_parity(pair, lr):
    # the fused census_wta pipeline (WTA kernel reading the padded uint8
    # cost frame) must match the jnp path bit-for-bit, with and without LR
    L, R, _, _ = pair
    cfg = Config(mode="census_wta", num_disparities=16, disp12_max_diff=lr,
                 speckle_window_size=0, median_filter=False)
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R),
                          cfg.replace(backend="jnp")))
    pal = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R),
                          cfg.replace(backend="pallas")))
    assert (ref == pal).all()


def test_p2_map_float_div_exhaustive():
    """p2_map's f32-division quotient (TPU has no vector integer divide)
    equals integer division EXHAUSTIVELY over the gated domain:
    P2 <= 4095 (the paths*(c_max+P2) < 4096 dispatch gate) x gradient
    g in [1, 255] (uint8 images). IEEE-754 correctly-rounded single
    division cannot cross an integer boundary here (|q - fl(q)| <
    ulp/2 < 1/g while q*g < 2^24) — this pins that argument."""
    p2 = np.arange(0, 4096, dtype=np.int64)
    g = np.arange(1, 256, dtype=np.int64)
    q_int = p2[:, None] // g[None, :]
    q_f = np.floor(p2[:, None].astype(np.float32)
                   / g[None, :].astype(np.float32)).astype(np.int64)
    assert (q_int == q_f).all()


def test_p2_map_matches_golden():
    """ops.sgm.p2_map (f32-div form) == golden._p2_map (int div) on a
    real image for every direction."""
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.golden.sgbm_numpy import _p2_map as golden_p2
    from tpustereo.ops.sgm import p2_map
    L, _, _, _ = synthetic_pair((48, 64), disparity=6.0, slope=0.05,
                                seed=11, noise=3.0)
    cfg = Config(num_disparities=16, adaptive_p2=True, p1=9, p2=250)
    for dy, dx in [(1, 0), (1, 1), (1, -1), (0, 1), (0, -1), (-1, 0),
                   (-1, 1), (-1, -1)]:
        ref = golden_p2(L, dy, dx, cfg)
        got = np.asarray(p2_map(jnp.asarray(L), dy, dx, cfg))
        np.testing.assert_array_equal(ref, got, err_msg=f"{dy},{dx}")
