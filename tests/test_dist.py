"""Distributed tests on the fake 8-device CPU mesh (SURVEY.md §5.0):
batch DP, strip tiling (halo + exact ring), halo-size accuracy measurement.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpustereo.config import Config
from tpustereo.data.synthetic import synthetic_pair
from tpustereo.dist import make_mesh, sgbm_data_parallel, sgbm_tiled, sgbm_tiled_batched
from tpustereo.pipeline import sgbm
from tpustereo.eval import bad

D = 16
H, W = 48, 64  # divisible by strip counts 2 and 4


@pytest.fixture(scope="module")
def pair():
    return synthetic_pair((H, W), disparity=6.0, slope=0.05, seed=7)


def _cfg(**kw):
    base = dict(num_disparities=D, speckle_window_size=20)
    base.update(kw)
    return Config(**base)


def test_mesh_construction():
    assert len(jax.devices()) >= 8, "conftest should fake 8 CPU devices"
    mesh = make_mesh(data=2, strip=4)
    assert mesh.shape == {"data": 2, "strip": 4}
    with pytest.raises(ValueError):
        make_mesh(data=4, strip=4)


@pytest.mark.slow
def test_data_parallel_matches_single(pair):
    L, R, _, _ = pair
    cfg = _cfg()
    lefts = np.stack([L, L[::-1], L, L[:, ::-1]])
    rights = np.stack([R, R[::-1], R, R[:, ::-1]])
    mesh = make_mesh(data=4, strip=1)
    out = np.asarray(sgbm_data_parallel(jnp.asarray(lefts), jnp.asarray(rights), cfg, mesh))
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    assert np.allclose(out[0], ref)


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_tiled_exact_ring_bitexact(pair, backend):
    """Exact ring mode == untiled, bit for bit, at 2 and 4 strips — on both
    the jnp ring and the Pallas q-carry ring (interpret mode on CPU)."""
    L, R, _, _ = pair
    cfg = _cfg(exact_tiling=True, paths=8, backend=backend)
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    for strips in (2, 4):
        mesh = make_mesh(data=1, strip=strips)
        out = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh))
        assert ((ref >= 0) == (out >= 0)).all(), f"validity differs at S={strips}"
        sel = ref >= 0
        assert np.abs(ref - out)[sel].max() < 1e-5, f"S={strips}"


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_tiled_exact_ring_fill_hirschmuller(pair, backend):
    """Gap filling is global postproc after the all_gather; the tiled
    hirschmuller fill (strip-local hits maps gathered alongside) must match
    the untiled pipeline everywhere, filled pixels included."""
    L, R, _, _ = pair
    cfg = _cfg(exact_tiling=True, paths=8, backend=backend,
               fill_mode="hirschmuller")
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    mesh = make_mesh(data=1, strip=4)
    out = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh))
    assert ((ref >= 0) == (out >= 0)).all()
    sel = ref >= 0
    assert np.abs(ref - out)[sel].max() < 1e-5


@pytest.mark.slow
def test_tiled_exact_ring_pallas_nondivisible(pair):
    """Pallas q-carry ring + zero-cost bottom padding: still bit-exact."""
    Ho = 45
    L, R, _, _ = synthetic_pair((Ho, W), disparity=6.0, slope=0.05, seed=3)
    cfg = _cfg(exact_tiling=True, paths=8, backend="pallas")
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    mesh = make_mesh(data=1, strip=4)
    out = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh))
    assert ((ref >= 0) == (out >= 0)).all()
    sel = ref >= 0
    assert np.abs(ref - out)[sel].max() < 1e-5


@pytest.mark.slow
def test_tiled_exact_ring_adaptive_p2(pair):
    L, R, _, _ = pair
    cfg = _cfg(exact_tiling=True, paths=4, adaptive_p2=True)
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    mesh = make_mesh(data=1, strip=4)
    out = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh))
    sel = ref >= 0
    assert ((ref >= 0) == (out >= 0)).all()
    assert np.abs(ref - out)[sel].max() < 1e-5


def test_tiled_sad_and_census_wta_exact(pair):
    """SAD and census+WTA modes are exactly tileable (window-local)."""
    L, R, _, _ = pair
    mesh = make_mesh(data=1, strip=4)
    for mode in ("sad", "census_wta"):
        cfg = Config(mode=mode, num_disparities=D, disp12_max_diff=-1,
                     speckle_window_size=0, median_filter=False)
        ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
        out = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh))
        assert ((ref >= 0) == (out >= 0)).all(), mode
        sel = ref >= 0
        assert np.abs(ref - out)[sel].max() < 1e-5, mode


@pytest.mark.slow
def test_halo_accuracy_vs_untiled(pair):
    """The halo-size/accuracy tradeoff, measured (SURVEY.md §7 hard parts):
    disagreement vs untiled must drop with halo and be small at halo=12."""
    L, R, _, _ = pair
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), _cfg(paths=8)))
    mesh = make_mesh(data=1, strip=2)
    mismatch = {}
    for halo in (2, 12):
        cfg = _cfg(paths=8, halo=halo)
        out = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh))
        both = (ref >= 0) & (out >= 0)
        mm = float((np.abs(ref - out)[both] > 0.5).mean()
                   + ((ref >= 0) != (out >= 0)).mean())
        mismatch[halo] = mm
    assert mismatch[12] <= mismatch[2] + 1e-9
    assert mismatch[12] < 0.03, mismatch


@pytest.mark.slow
def test_tiled_batched(pair):
    L, R, _, _ = pair
    cfg = _cfg(paths=4, exact_tiling=True)
    lefts = jnp.stack([jnp.asarray(L), jnp.asarray(L[::-1])])
    rights = jnp.stack([jnp.asarray(R), jnp.asarray(R[::-1])])
    mesh = make_mesh(data=2, strip=4)
    out = np.asarray(sgbm_tiled_batched(lefts, rights, cfg, mesh))
    ref0 = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    assert out.shape == (2, H, W)
    sel = ref0 >= 0
    assert ((ref0 >= 0) == (out[0] >= 0)).all()
    assert np.abs(ref0 - out[0])[sel].max() < 1e-5


@pytest.mark.slow
def test_tiled_nondivisible_rows_bitexact():
    """H not divisible by the strip count: bottom rows are padded with
    exact zero-cost rows (fresh path starts), so exact-ring mode stays
    bit-identical to untiled — the KITTI-375-rows-over-2-strips case."""
    Ho = 45  # not divisible by 2 or 4
    L, R, _, _ = synthetic_pair((Ho, W), disparity=6.0, slope=0.05, seed=3)
    cfg = _cfg(exact_tiling=True, paths=8)
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    for strips in (2, 4):
        mesh = make_mesh(data=1, strip=strips)
        out = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh))
        assert out.shape == (Ho, W)
        assert ((ref >= 0) == (out >= 0)).all(), f"S={strips}"
        sel = ref >= 0
        assert np.abs(ref - out)[sel].max() < 1e-5, f"S={strips}"


@pytest.mark.slow
def test_tiled_nondivisible_rows_halo_pallas():
    """Non-divisible H on the halo + fused-kernel (interpret) path: runs,
    right shape, and close to untiled away from strip boundaries."""
    Ho = 45
    L, R, _, _ = synthetic_pair((Ho, W), disparity=6.0, slope=0.05, seed=3)
    cfg = _cfg(paths=8, halo=12, backend="pallas")
    mesh = make_mesh(data=1, strip=2)
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    out = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh))
    assert out.shape == (Ho, W)
    both = (ref >= 0) & (out >= 0)
    mm = float((np.abs(ref - out)[both] > 0.5).mean()
               + ((ref >= 0) != (out >= 0)).mean())
    assert mm < 0.05, mm


def test_disp_axis_sharding_matches_single(pair):
    """SURVEY.md #17: D axis sharded over chips, pmin-resolved WTA equals
    the single-device integer WTA (census_wta mode)."""
    from tpustereo.dist import make_mesh, wta_disparity_sharded
    from tpustereo.ops import census, cost_volume, wta

    L, R, _, _ = pair
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    cfg = Config(mode="census_wta", num_disparities=32, uniqueness_ratio=0,
                 subpixel=False, disp12_max_diff=-1, speckle_window_size=0,
                 median_filter=False)
    mesh = make_mesh(data=1, strip=4)
    out = np.asarray(wta_disparity_sharded(l8, r8, cfg, mesh))
    C = cost_volume(census(l8), census(r8), 32, cfg.max_census_cost)
    _, d_int, _ = wta(C.astype(jnp.int16), cfg)
    np.testing.assert_array_equal(out, np.asarray(d_int).astype(np.float32))


@pytest.mark.slow
def test_tiled_halo_fused_kernels_match_jnp(pair):
    """The halo-tiled pallas (fused kernels, interpret) path must equal the
    halo-tiled jnp path exactly — same halo approximation, same math."""
    L, R, _, _ = pair
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    cfg = _cfg(mode="sgm", paths=8, halo=12, strips=2)
    mesh = make_mesh(data=1, strip=2)
    a = np.asarray(sgbm_tiled(l8, r8, cfg.replace(backend="jnp"), mesh))
    b = np.asarray(sgbm_tiled(l8, r8, cfg.replace(backend="pallas"), mesh))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["jnp", "pallas"])
def test_tiled_exact_ring_min_disparity(pair, backend):
    """Exact ring mode == untiled with min_disparity > 0 (the fused strip
    bodies plumb d_start through the cost kernel / index-based LR)."""
    L, R, _, _ = pair
    cfg = _cfg(exact_tiling=True, paths=8, backend=backend, min_disparity=3)
    ref = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R), cfg))
    mesh = make_mesh(data=1, strip=4)
    out = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R), cfg, mesh))
    assert ((ref >= 0) == (out >= 0)).all()
    sel = ref >= 0
    assert np.abs(ref - out)[sel].max() < 1e-5


@pytest.mark.slow
def test_tiled_sad_census_wta_pallas_matches_jnp(pair):
    """The tiled census_wta strip body rides the fused cost+WTA kernels
    and tiled SAD selection rides the WTA/LR kernel (TPU-first; no jnp
    compute on the strip hot path) — bit-exact vs the jnp tiled twin,
    incl. min_disparity."""
    L, R, _, _ = pair
    mesh = make_mesh(data=1, strip=4)
    for mode in ("sad", "census_wta"):
        for d0 in (0, 3):
            cfg = Config(mode=mode, num_disparities=D, min_disparity=d0,
                         disp12_max_diff=1, speckle_window_size=0,
                         median_filter=False)
            a = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R),
                                      cfg.replace(backend="jnp"), mesh))
            b = np.asarray(sgbm_tiled(jnp.asarray(L), jnp.asarray(R),
                                      cfg.replace(backend="pallas"), mesh))
            np.testing.assert_array_equal(a, b, err_msg=f"{mode} d0={d0}")
