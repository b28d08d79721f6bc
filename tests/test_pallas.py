"""Pallas kernel parity tests — interpret mode on CPU (SURVEY.md §7 step 4):
the kernels must be bit-exact vs the pure-jnp ops, which are themselves
bit-exact vs the golden NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpustereo.config import Config
from tpustereo.ops import aggregate, census, cost_volume
from tpustereo.kernels import aggregate_pallas
from tpustereo.pipeline import sgbm


def _volume(pair, cfg):
    L, R, _, _ = pair
    cl = census(jnp.asarray(L), cfg.census_window)
    cr = census(jnp.asarray(R), cfg.census_window)
    return cost_volume(cl, cr, cfg.num_disparities, cfg.max_census_cost)


@pytest.mark.slow
@pytest.mark.parametrize("paths", [4, 8])
@pytest.mark.parametrize("adaptive", [False, True])
def test_aggregate_pallas_bit_exact(small_pair, paths, adaptive):
    cfg = Config(num_disparities=32, paths=paths, adaptive_p2=adaptive)
    C = _volume(small_pair, cfg)
    img = jnp.asarray(small_pair[0])
    S_ref = np.asarray(aggregate(C, cfg, img))
    S_pal = np.asarray(aggregate_pallas(C, cfg, img, interpret=True))
    np.testing.assert_array_equal(S_ref, S_pal)


def test_aggregate_pallas_unaligned_shapes(rng):
    """Non-multiple-of-tile H/W and D<128 exercise the padding/masking."""
    H, W, D = 21, 45, 16
    C = jnp.asarray(rng.integers(0, 25, (H, W, D), dtype=np.uint8))
    img = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    cfg = Config(num_disparities=D, paths=8, p1=7, p2=90)
    np.testing.assert_array_equal(
        np.asarray(aggregate(C, cfg, img)),
        np.asarray(aggregate_pallas(C, cfg, img, interpret=True)))


@pytest.mark.slow
def test_pipeline_backend_pallas_matches_jnp(small_pair):
    """Full pipeline with backend='pallas' (interpret on CPU) == 'jnp'."""
    L, R, _, _ = small_pair
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    cfg = Config(num_disparities=32, paths=8)
    a = np.asarray(sgbm(l8, r8, cfg.replace(backend="jnp")))
    b = np.asarray(sgbm(l8, r8, cfg.replace(backend="pallas")))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("uniq,subpix,lrmax", [(10, True, 1), (0, False, -1),
                                               (10, True, 2), (5, False, 0)])
def test_wta_lr_pallas_bit_exact(small_pair, uniq, subpix, lrmax):
    from tpustereo.ops import lr_check, wta
    from tpustereo.kernels import wta_lr_pallas
    cfg = Config(num_disparities=32, paths=8, uniqueness_ratio=uniq,
                 subpixel=subpix, disp12_max_diff=lrmax)
    C = _volume(small_pair, cfg)
    img = jnp.asarray(small_pair[0])
    S = aggregate(C, cfg, img)
    d_ref, _, v_ref = wta(S, cfg)
    v_ref = v_ref & lr_check(S, d_ref, cfg)
    d_p, v_p = wta_lr_pallas(S, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_p))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_p))


@pytest.mark.parametrize("D", [32, 64])
def test_census_cost_volume_pallas_bit_exact(small_pair, D):
    from tpustereo.kernels import census_cost_volume_pallas
    L, R, _, _ = small_pair
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    ref = np.asarray(cost_volume(census(l8), census(r8), D, 24))
    pal = np.asarray(census_cost_volume_pallas(l8, r8, D, 24, interpret=True))
    np.testing.assert_array_equal(ref, pal)


def test_wta_lr_pallas_unaligned(rng):
    """Odd H/W and D<128 exercise padding/masking in the fused kernel."""
    from tpustereo.ops import lr_check, wta
    from tpustereo.kernels import wta_lr_pallas
    H, W, D = 19, 43, 16
    S = jnp.asarray(rng.integers(0, 1000, (H, W, D)).astype(np.int16))
    cfg = Config(num_disparities=D)
    d_ref, _, v_ref = wta(S, cfg)
    v_ref = v_ref & lr_check(S, d_ref, cfg)
    d_p, v_p = wta_lr_pallas(S, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_p))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_p))


@pytest.mark.parametrize("shape", [(48, 64), (37, 101)])
def test_cc_pallas_bit_exact(rng, shape):
    from tpustereo.ops.postproc import connected_component_labels
    from tpustereo.kernels import connected_component_labels_pallas
    H, W = shape
    ch = jnp.asarray(rng.random((H, W - 1)) > 0.45)
    cv = jnp.asarray(rng.random((H - 1, W)) > 0.45)
    ref = np.asarray(connected_component_labels(ch, cv))
    pal = np.asarray(connected_component_labels_pallas(ch, cv, interpret=True))
    np.testing.assert_array_equal(ref, pal)


def test_cc_pallas_hilbert_component(rng):
    # ADVICE r1 (high): high-bend component must converge (see the jnp twin
    # in test_ops_parity.py); the kernel's old Hp+Wq cap fragmented it.
    from tests.conftest import hilbert_path_mask
    from tpustereo.ops.postproc import connected_component_labels
    from tpustereo.kernels import connected_component_labels_pallas
    valid = hilbert_path_mask(4)
    ch = jnp.asarray(valid[:, :-1] & valid[:, 1:])
    cv = jnp.asarray(valid[:-1, :] & valid[1:, :])
    ref = np.asarray(connected_component_labels(ch, cv))
    pal = np.asarray(connected_component_labels_pallas(ch, cv, interpret=True))
    np.testing.assert_array_equal(ref, pal)
    assert np.unique(pal[valid]).size == 1


@pytest.mark.slow
def test_fuzz_random_configs_pallas_vs_jnp(rng):
    """Random config fuzz: the dispatcher must produce identical pipelines
    for every knob combination (interpret mode on CPU)."""
    from tpustereo.data.synthetic import synthetic_pair
    L, R, _, _ = synthetic_pair((40, 56), disparity=5.0, slope=0.04, seed=9)
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    for trial in range(7):
        disp12 = int(rng.choice([-1, 0, 2]))
        fill = str(rng.choice(["off", "background", "hirschmuller"]))
        if fill == "hirschmuller" and disp12 < 0:
            fill = "background"  # invalid combination (Config rejects it)
        # trials 5-6 fuzz the non-SGM dispatchers (fused SAD plane-sweep
        # incl. its off-gate fallbacks, fused census_wta)
        mode = ("sad" if trial == 5 else
                "census_wta" if trial == 6 else "sgm")
        cfg = Config(
            mode=mode,
            sad_block=int(rng.choice([5, 9, 11, 13])),
            num_disparities=int(rng.choice([16, 32])),
            min_disparity=int(rng.choice([0, 3])),
            census_window=(5, 5) if rng.integers(0, 2) else (7, 5),
            paths=int(rng.choice([4, 8])),
            p1=int(rng.integers(1, 20)),
            p2=int(rng.integers(40, 200)),
            adaptive_p2=bool(rng.integers(0, 2)),
            uniqueness_ratio=int(rng.choice([0, 5, 15])),
            subpixel=bool(rng.integers(0, 2)),
            disp12_max_diff=disp12,
            speckle_window_size=int(rng.choice([0, 30])),
            median_filter=bool(rng.integers(0, 2)),
            fill_mode=fill,
        )
        a = np.asarray(sgbm(l8, r8, cfg.replace(backend="jnp")))
        b = np.asarray(sgbm(l8, r8, cfg.replace(backend="pallas")))
        np.testing.assert_array_equal(a, b, err_msg=f"cfg={cfg}")
        if trial < 2:
            # same config through the bf16 sweep branch (gated off for
            # adaptive_p2 / c_max+p2 > 255 inside sgm_sweep — the fuzz
            # then just re-exercises the default branch, still equal)
            import jax
            import tpustereo.kernels.sgm_pallas as sp
            old = sp.SWEEP_BF16, sp.BWD_BF16
            sp.SWEEP_BF16 = sp.BWD_BF16 = True
            jax.clear_caches()
            try:
                c = np.asarray(sgbm(l8, r8, cfg.replace(backend="pallas")))
            finally:
                sp.SWEEP_BF16, sp.BWD_BF16 = old
                jax.clear_caches()
            np.testing.assert_array_equal(a, c, err_msg=f"bf16 cfg={cfg}")


def test_census_cost_volume_pallas_two_planes(small_pair):
    """9x7 census (62 bits) exercises the multi-plane kernel path."""
    from tpustereo.kernels import census_cost_volume_pallas
    L, R, _, _ = small_pair
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    win = (9, 7)
    ref = np.asarray(cost_volume(census(l8, win), census(r8, win), 32, 62))
    pal = np.asarray(census_cost_volume_pallas(l8, r8, 32, 62, win,
                                               interpret=True))
    np.testing.assert_array_equal(ref, pal)


def test_dr_consistency_pallas_bit_exact(rng):
    from tpustereo.kernels import dr_consistency_pallas
    from tpustereo.ops.postproc import dr_consistency
    H, W, D = 40, 72, 32
    for trial in range(3):
        d_r = jnp.asarray(rng.integers(0, D, (H, W), dtype=np.int32))
        disp = jnp.asarray(
            rng.uniform(-0.5, D - 0.5, (H, W)).astype(np.float32))
        for md in (0, 1, 2):
            ref = np.asarray(dr_consistency(d_r, disp, D, md))
            pal = np.asarray(dr_consistency_pallas(d_r, disp, D, md,
                                                   interpret=True))
            assert (ref == pal).all(), (trial, md)


def test_dr_consistency_pallas_with_hits(rng):
    from tpustereo.kernels import dr_consistency_pallas
    from tpustereo.ops.postproc import dr_consistency, lr_hits
    H, W, D = 40, 72, 32
    d_r = jnp.asarray(rng.integers(0, D, (H, W), dtype=np.int32))
    disp = jnp.asarray(rng.uniform(-0.5, D - 0.5, (H, W)).astype(np.float32))
    for md in (0, 1, 2):
        cfg = Config(num_disparities=D, disp12_max_diff=md)
        ok, hits = dr_consistency_pallas(d_r, disp, D, md, interpret=True,
                                         with_hits=True)
        np.testing.assert_array_equal(np.asarray(ok),
                                      np.asarray(dr_consistency(d_r, disp,
                                                                D, md)))
        np.testing.assert_array_equal(np.asarray(hits),
                                      np.asarray(lr_hits(d_r, cfg)))


def test_cc_banded_matches_whole(rng):
    # banded mode (oversized-image path): per-band in-VMEM CC + jnp
    # refinement must equal the jnp labels exactly, including components
    # snaking across several band boundaries
    from tpustereo.kernels.cc_pallas import connected_component_labels_pallas
    from tpustereo.ops.postproc import connected_component_labels
    v = rng.random((48, 64)) < 0.55
    v[:, 5] = True  # one tall component crossing every band
    conn_h = jnp.asarray(v[:, :-1] & v[:, 1:])
    conn_v = jnp.asarray(v[:-1, :] & v[1:, :])
    ref = np.asarray(connected_component_labels(conn_h, conn_v))
    banded = np.asarray(connected_component_labels_pallas(
        conn_h, conn_v, interpret=True, band_rows=16))
    assert (ref == banded).all()


def test_cc_banded_serpentine_multicycle(rng):
    # worst case for the alternating-offset banded scheme: one serpentine
    # component whose min label must zig-zag through every band boundary
    # several times before the outer cycle converges
    from tpustereo.kernels.cc_pallas import connected_component_labels_pallas
    from tpustereo.ops.postproc import connected_component_labels
    H, W = 64, 32
    v = np.zeros((H, W), bool)
    for k in range(H // 8):  # horizontal rungs every 8 rows
        v[k * 8, :] = True
        col = W - 1 if k % 2 == 0 else 0  # alternating side connectors
        v[k * 8:min(H, (k + 1) * 8) + 1, col] = True
    v[-1, :] = True
    conn_h = jnp.asarray(v[:, :-1] & v[:, 1:])
    conn_v = jnp.asarray(v[:-1, :] & v[1:, :])
    ref = np.asarray(connected_component_labels(conn_h, conn_v))
    banded = np.asarray(connected_component_labels_pallas(
        conn_h, conn_v, interpret=True, band_rows=8))
    assert (ref == banded).all()
    assert np.unique(banded[v]).size == 1


@pytest.mark.slow
@pytest.mark.parametrize("frames,fill", [(2, "off"), (3, "hirschmuller")])
def test_sgbm_frames_matches_singles(rng, frames, fill):
    """Frame-stacked fused pipeline (one set of kernel launches for F
    frames, carry reset at seams) is bit-exact vs F single-frame runs."""
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline.sgbm import sgbm_frames
    cfg = Config(num_disparities=32, paths=8, backend="pallas",
                 fill_mode=fill, speckle_window_size=20)
    Ls, Rs = [], []
    for f in range(frames):
        L, R, _, _ = synthetic_pair((41, 67), disparity=5.0 + 3 * f,
                                    slope=0.04, seed=100 + f)
        Ls.append(L)
        Rs.append(R)
    Ls = jnp.asarray(np.stack(Ls))
    Rs = jnp.asarray(np.stack(Rs))
    stacked = np.asarray(sgbm_frames(Ls, Rs, cfg))
    singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], cfg))
                        for f in range(frames)])
    np.testing.assert_array_equal(stacked, singles)


@pytest.mark.slow
def test_sgbm_batched_frames_per_step(rng):
    """sgbm_batched with frames_per_step > 1 equals the per-frame scan."""
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline.sgbm import sgbm_batched
    cfg = Config(num_disparities=32, paths=8, backend="pallas")
    pairs = [synthetic_pair((33, 49), disparity=4.0 + f, slope=0.03,
                            seed=200 + f)[:2] for f in range(4)]
    L = jnp.asarray(np.stack([p[0] for p in pairs]))
    R = jnp.asarray(np.stack([p[1] for p in pairs]))
    a = np.asarray(sgbm_batched(L, R, cfg))
    b = np.asarray(sgbm_batched(L, R, cfg.replace(frames_per_step=2)))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_sgbm_frames_4path(rng):
    """Frame stacking with the 4-path preset shape (K=1 vertical sweeps)."""
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline.sgbm import sgbm_frames
    cfg = Config(num_disparities=32, paths=4, backend="pallas",
                 speckle_window_size=30)
    Ls, Rs = [], []
    for f in range(2):
        L, R, _, _ = synthetic_pair((38, 53), disparity=6.0 + f, slope=0.05,
                                    seed=300 + f)
        Ls.append(L)
        Rs.append(R)
    Ls, Rs = jnp.asarray(np.stack(Ls)), jnp.asarray(np.stack(Rs))
    stacked = np.asarray(sgbm_frames(Ls, Rs, cfg))
    singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], cfg))
                        for f in range(2)])
    np.testing.assert_array_equal(stacked, singles)


@pytest.mark.parametrize(
    "D,blk,d0,uniq,subp,d12",
    [(16, 5, 0, 0, False, -1), (32, 9, 0, 10, True, 1),
     (32, 9, 3, 10, True, -1), (16, 11, 0, 0, True, 1),
     (32, 5, 3, 5, False, 2), (16, 9, 0, 10, False, 0),
     (128, 9, 0, 10, True, 1),    # D > W: search wider than the image
     (96, 9, 40, 10, True, 1)])   # large min_disparity + D > W - d0
def test_sad_fused_matches_jnp(rng, D, blk, d0, uniq, subp, d12):
    """Fused plane-sweep SAD kernel (kernels/sad_pallas.py) is bit-exact
    vs the jnp sad_volume + wta + lr_check path across the knob matrix
    (block size, min_disparity, uniqueness, subpixel, LR check)."""
    from tpustereo.data.synthetic import synthetic_pair
    L, R, _, _ = synthetic_pair((45, 70), disparity=8.0, slope=0.05, seed=3)
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    cfg = Config(mode="sad", num_disparities=D, sad_block=blk,
                 min_disparity=d0, uniqueness_ratio=uniq, subpixel=subp,
                 disp12_max_diff=d12, speckle_window_size=0,
                 median_filter=False)
    a = np.asarray(sgbm(l8, r8, cfg.replace(backend="jnp")))
    b = np.asarray(sgbm(l8, r8, cfg.replace(backend="pallas")))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_sad_fused_frames_and_fallbacks(rng):
    """SAD frame stacking (F grid segments of one launch) == singles with
    full postproc; hirschmuller fill and block 13 fall back to the volume
    path and still match jnp."""
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline.sgbm import sgbm_frames
    cfg = Config(mode="sad", num_disparities=32, sad_block=9,
                 backend="pallas", uniqueness_ratio=10, subpixel=True,
                 disp12_max_diff=1, speckle_window_size=30,
                 median_filter=True, fill_mode="background")
    Ls, Rs = [], []
    for f in range(3):
        L, R, _, _ = synthetic_pair((41, 67), disparity=5.0 + 2 * f,
                                    slope=0.04, seed=600 + f)
        Ls.append(L)
        Rs.append(R)
    Ls, Rs = jnp.asarray(np.stack(Ls)), jnp.asarray(np.stack(Rs))
    stacked = np.asarray(sgbm_frames(Ls, Rs, cfg))
    singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], cfg))
                        for f in range(3)])
    np.testing.assert_array_equal(stacked, singles)
    np.testing.assert_array_equal(
        np.asarray(sgbm(Ls[0], Rs[0], cfg.replace(backend="jnp"))),
        singles[0])
    for off_gate in (dict(fill_mode="hirschmuller"), dict(sad_block=13)):
        c = cfg.replace(**off_gate)
        np.testing.assert_array_equal(
            np.asarray(sgbm(Ls[0], Rs[0], c.replace(backend="jnp"))),
            np.asarray(sgbm(Ls[0], Rs[0], c)))


@pytest.mark.slow
@pytest.mark.parametrize("bf16", [True, False])
def test_sgbm_frames_adaptive_p2(rng, bf16):
    """Adaptive-P2 rides the F-stacked fused path (VERDICT r4 next #2):
    per-frame p2 maps stacked in the volume band layout, bit-exact vs
    singles through both the bf16 and the v32 sweep branches (adaptive
    configs never take SWAR — its gate excludes p2_maps)."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline.sgbm import sgbm_frames
    cfg = Config(num_disparities=32, paths=8, backend="pallas",
                 adaptive_p2=True, speckle_window_size=20)
    Ls, Rs = [], []
    for f in range(3):
        L, R, _, _ = synthetic_pair((41, 67), disparity=5.0 + 2 * f,
                                    slope=0.04, seed=500 + f)
        Ls.append(L)
        Rs.append(R)
    Ls, Rs = jnp.asarray(np.stack(Ls)), jnp.asarray(np.stack(Rs))
    old = sp.SWEEP_BF16
    sp.SWEEP_BF16 = bf16
    jax.clear_caches()
    try:
        stacked = np.asarray(sgbm_frames(Ls, Rs, cfg))
        singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], cfg))
                            for f in range(3)])
    finally:
        sp.SWEEP_BF16 = old
        jax.clear_caches()
    np.testing.assert_array_equal(stacked, singles)


def test_sgbm_frames_census_wta(rng):
    """Frame-stacked census_wta path == singles (row-local WTA kernel)."""
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline.sgbm import sgbm_frames
    cfg = Config(mode="census_wta", num_disparities=32, backend="pallas",
                 disp12_max_diff=-1, speckle_window_size=0,
                 median_filter=False)
    Ls, Rs = [], []
    for f in range(3):
        L, R, _, _ = synthetic_pair((29, 44), disparity=4.0 + 2 * f,
                                    slope=0.06, seed=400 + f)
        Ls.append(L)
        Rs.append(R)
    Ls, Rs = jnp.asarray(np.stack(Ls)), jnp.asarray(np.stack(Rs))
    stacked = np.asarray(sgbm_frames(Ls, Rs, cfg))
    singles = np.stack([np.asarray(sgbm(Ls[f], Rs[f], cfg))
                        for f in range(3)])
    np.testing.assert_array_equal(stacked, singles)


@pytest.mark.parametrize("n", [256, 700, 4096])
def test_bitonic_sort_pallas(rng, n):
    """Keys-only and pair mode vs numpy, with heavy key duplication (the
    speckle labelling regime). Pair mode is unstable but must stay a
    permutation with correct key-payload pairing."""
    from tpustereo.kernels import bitonic_sort_pallas
    k = rng.integers(0, 50, (n,)).astype(np.int32)
    s = np.asarray(bitonic_sort_pallas(jnp.asarray(k), interpret=True))
    np.testing.assert_array_equal(s, np.sort(k))
    idx = jnp.arange(n, dtype=jnp.int32)
    sk, sp = bitonic_sort_pallas(jnp.asarray(k), idx, interpret=True)
    sk, sp = np.asarray(sk), np.asarray(sp)
    np.testing.assert_array_equal(sk, np.sort(k))
    assert sorted(sp.tolist()) == list(range(n))
    np.testing.assert_array_equal(k[sp], sk)


@pytest.mark.parametrize("n", [2100, 4096, 5000])
def test_bitonic_sort_pallas_multipart(rng, n, monkeypatch):
    """The blocked path: Q parts with cross-part exchange substages and the
    reused tail kernel (production runs Q = 4 at KITTI size; here the part
    size is shrunk so Q in {2, 4, 8} is covered at test scale)."""
    import tpustereo.kernels.bitonic_pallas as bp
    from tpustereo.kernels import bitonic_sort_pallas
    monkeypatch.setattr(bp, "_PART_LOG2", 10)
    k = rng.integers(0, 60, (n,)).astype(np.int32)
    s = np.asarray(bitonic_sort_pallas(jnp.asarray(k), interpret=True))
    np.testing.assert_array_equal(s, np.sort(k))
    idx = jnp.arange(n, dtype=jnp.int32)
    sk, sp = bitonic_sort_pallas(jnp.asarray(k), idx, interpret=True)
    sk, sp = np.asarray(sk), np.asarray(sp)
    np.testing.assert_array_equal(sk, np.sort(k))
    assert sorted(sp.tolist()) == list(range(n))
    np.testing.assert_array_equal(k[sp], sk)


@pytest.mark.slow
def test_component_big_bitonic_matches_lax(rng):
    """component_big via the bitonic kernel == the lax.sort formulation ==
    brute-force sizes, on a labelling with many small components."""
    from tpustereo.ops.postproc import component_big, component_sizes
    from tpustereo.ops.postproc import connected_component_labels
    H, W = 40, 72
    d = (rng.random((H, W)) < 0.55)
    conn_h = d[:, :-1] & d[:, 1:]
    conn_v = d[:-1, :] & d[1:, :]
    lab = connected_component_labels(jnp.asarray(conn_h), jnp.asarray(conn_v))
    for thresh in (1, 5, 40):
        ref = np.asarray(component_big(lab, thresh))
        pal = np.asarray(component_big(lab, thresh, use_pallas=True,
                                       interpret=True))
        np.testing.assert_array_equal(ref, pal)
    sizes = np.asarray(component_sizes(lab))
    np.testing.assert_array_equal(
        np.asarray(component_big(lab, 5, use_pallas=True, interpret=True)),
        sizes >= 5)


@pytest.mark.slow
def test_sweep_batch_dirs_matches_per_direction(small_pair, monkeypatch):
    """BATCH_DIRS (off-default: r22 measured a perf wash) must stay
    bit-exact vs the per-direction sweep path."""
    import tpustereo.kernels.sgm_pallas as sp
    cfg = Config(num_disparities=128, paths=8)
    C = _volume(small_pair, cfg)
    ref = np.asarray(sp.aggregate_pallas(C, cfg, jnp.asarray(small_pair[0]),
                                         interpret=True))
    monkeypatch.setattr(sp, "BATCH_DIRS", True)
    got = np.asarray(sp.aggregate_pallas(C, cfg, jnp.asarray(small_pair[0]),
                                         interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_running_scan_hillis_steele_matches_assoc(rng, monkeypatch):
    """The large-n Hillis-Steele path (associative_scan compiles
    pathologically beyond ~2M on the TPU) == associative_scan."""
    import jax

    import tpustereo.ops.postproc as pp
    v = jnp.asarray(rng.integers(-50, 50, (3001,)).astype(np.int32))
    want_max = np.asarray(jax.lax.associative_scan(jnp.maximum, v))
    want_min = np.asarray(jax.lax.associative_scan(jnp.minimum, v,
                                                   reverse=True))
    monkeypatch.setattr(pp, "_ASSOC_SCAN_MAX_N", 16)
    np.testing.assert_array_equal(
        np.asarray(pp._running_scan(v, jnp.maximum, -(1 << 30))), want_max)
    np.testing.assert_array_equal(
        np.asarray(pp._running_scan(v, jnp.minimum, 1 << 30, reverse=True)),
        want_min)


@pytest.mark.slow
def test_component_big_frames_matches_per_frame(rng):
    """Batched-axis sort formulation == per-frame component_big."""
    from tpustereo.ops.postproc import (component_big, component_big_frames,
                                        connected_component_labels)
    H, W, F = 32, 48, 3
    labs = []
    for f in range(F):
        d = rng.random((H, W)) < 0.5 + 0.1 * f
        lab = connected_component_labels(jnp.asarray(d[:, :-1] & d[:, 1:]),
                                         jnp.asarray(d[:-1, :] & d[1:, :]))
        labs.append(lab)
    labs = jnp.stack(labs)
    for thresh in (1, 6, 30):
        ref = np.stack([np.asarray(component_big(labs[f], thresh))
                        for f in range(F)])
        got = np.asarray(component_big_frames(labs, thresh))
        np.testing.assert_array_equal(ref, got)


def test_sweep_emit_transposed_matches_transpose(small_pair):
    """Two fused transposed-emission sweeps, absorbed by a two-S-operand
    forward sweep, == chained sweeps + tile transpose + one-S forward."""
    from tpustereo.kernels import sgm_sweep, transpose_hw_pallas
    cfg = Config(num_disparities=128, paths=8)
    C = _volume(small_pair, cfg)
    H, W, D = C.shape
    Hp = (H + 7) // 8 * 8
    Wq = (W + 127) // 128 * 128
    Cp = jnp.pad(C, ((0, Hp - H), (0, Wq - W), (0, 0)))
    dxs = (0, 1, -1)
    S = sgm_sweep(Cp, None, dxs, False, p1=cfg.p1, p2=cfg.p2, n_real=W,
                  d_real=D, interpret=True)
    up = sgm_sweep(Cp, S, dxs, True, p1=cfg.p1, p2=cfg.p2, n_real=W,
                   d_real=D, interpret=True)
    St_ref = transpose_hw_pallas(up, interpret=True, trim=False)
    St_a = sgm_sweep(Cp, None, dxs, False, p1=cfg.p1, p2=cfg.p2, n_real=W,
                     d_real=D, emit_transposed=True, interpret=True)
    St_b = sgm_sweep(Cp, None, dxs, True, p1=cfg.p1, p2=cfg.p2, n_real=W,
                     d_real=D, emit_transposed=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(St_ref),
                                  np.asarray(St_a) + np.asarray(St_b))
    # the forward horizontal sweep absorbs both partial volumes
    Ct = transpose_hw_pallas(Cp, interpret=True, trim=False)
    fwd_ref = sgm_sweep(Ct, St_ref, (0,), False, p1=cfg.p1, p2=cfg.p2,
                        n_real=H, d_real=D, interpret=True)
    fwd2 = sgm_sweep(Ct, (St_a, St_b), (0,), False, p1=cfg.p1, p2=cfg.p2,
                     n_real=H, d_real=D, interpret=True)
    np.testing.assert_array_equal(np.asarray(fwd_ref), np.asarray(fwd2))


@pytest.mark.parametrize("d_real", [128, 64])
def test_sweep_v32_branch_parity(rng, d_real):
    """SWEEP_SWAR=True is the default, so the v32 branch would otherwise
    lose interpret-mode coverage; pin both branches equal on a mixed
    diagonal sweep with scan-axis padding (n_real < N). d_real=64 covers
    the SWAR padded-disparity-lane masking (cpk/big2) that presets with
    num_disparities < 128 otherwise exercise only on-chip (r3 advisor);
    padded lanes are allowed to differ between branches, so only the real
    slice is compared there."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    C = jnp.asarray(rng.integers(0, 25, (16, 64, 128)).astype(np.int8))
    outs = {}
    for flag in (True, False):
        old = sp.SWEEP_SWAR
        sp.SWEEP_SWAR = flag
        jax.clear_caches()
        try:
            outs[flag] = np.asarray(sp.sgm_sweep(
                C, None, (0, 1, -1), True, p1=10, p2=120, n_real=58,
                d_real=d_real, interpret=True))
        finally:
            sp.SWEEP_SWAR = old
            jax.clear_caches()
    assert (outs[True][..., :d_real] == outs[False][..., :d_real]).all()


@pytest.mark.slow
def test_bwd_wta_swar_branch_parity(rng):
    """Pin the bwd+WTA kernel's SWAR branch against its v32 branch in
    interpret mode across the uniqueness/subpixel matrix, with scan-axis
    padding (w_real < T) exercising the state guard. N=32 satisfies the
    N % 16 swar gate; CPU-only coverage the pipeline tests only hit
    incidentally (r3 review finding)."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    T, N, D = 128, 32, 128
    Ct = jnp.asarray(rng.integers(0, 25, (T, N, D)).astype(np.int8))
    St = jnp.asarray(rng.integers(0, 500, (T, N, D)).astype(np.int16))
    # d_real=64 < D covers the per-half _BIGPACK masking of padded
    # disparity lanes inside the SWAR branch (r3 advisor); the outputs
    # are per-pixel maps, so they compare in full either way
    for d_real in (128, 64):
        for cfg in (Config(num_disparities=d_real),
                    Config(num_disparities=d_real, uniqueness_ratio=0,
                           subpixel=False)):
            outs = {}
            for flag in (True, False):
                old = sp.SWEEP_SWAR
                sp.SWEEP_SWAR = flag
                jax.clear_caches()
                try:
                    outs[flag] = [np.asarray(v) for v in sp.sweep_bwd_wta(
                        Ct, St, cfg, w_real=120, d_real=d_real,
                        interpret=True)]
                finally:
                    sp.SWEEP_SWAR = old
                    jax.clear_caches()
            for a, b in zip(outs[True], outs[False]):
                assert (a == b).all()


@pytest.mark.parametrize("mode,kw", [
    ("sgm", {}),
    ("sgm", dict(paths=4, fill_mode="hirschmuller")),
    ("census_wta", {}),
    ("sad", {}),
])
@pytest.mark.slow
@pytest.mark.parametrize("d0", [5, 11])
def test_pipeline_min_disparity_pallas_matches_jnp(rng, mode, kw, d0):
    """min_disparity > 0 through the FUSED kernel paths (VERDICT r3 next
    #1): cost-kernel constant shear roll, index-based WTA/LR with the
    shifted-column d_r convention, hits map for hirschmuller fill. Bit
    exact vs the jnp fallback (itself golden-exact, test_golden)."""
    from tpustereo.data.synthetic import synthetic_pair
    L, R, _, _ = synthetic_pair((40, 96), disparity=12.0, slope=0.04, seed=3)
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    cfg = Config(mode=mode, num_disparities=32, min_disparity=d0,
                 disp12_max_diff=1, speckle_window_size=20, **kw)
    a = np.asarray(sgbm(l8, r8, cfg.replace(backend="jnp")))
    b = np.asarray(sgbm(l8, r8, cfg.replace(backend="pallas")))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["sgm", "census_wta"])
@pytest.mark.parametrize("D,d0", [(256, 0), (256, 7), (160, 0)])
def test_pipeline_d256_pallas_matches_jnp(mode, D, d0):
    """D up to 256 through the fused kernels (VERDICT r3 next #1): the
    roll-trees/shears gain a level, the minor axis runs as two 128-lane
    vregs, and the *256 WTA lane packing stays exact. W > D so real
    matches exist across the whole search range."""
    from tpustereo.data.synthetic import synthetic_pair
    L, R, _, _ = synthetic_pair((24, 320), disparity=150.0, slope=0.1,
                                seed=5)
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    cfg = Config(mode=mode, num_disparities=D, min_disparity=d0,
                 disp12_max_diff=1, speckle_window_size=20)
    a = np.asarray(sgbm(l8, r8, cfg.replace(backend="jnp")))
    b = np.asarray(sgbm(l8, r8, cfg.replace(backend="pallas")))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_sgbm_frames_min_disparity(rng):
    """Frame-stacked fused path with min_disparity > 0 == per-frame runs."""
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline.sgbm import sgbm_frames
    Ls, Rs = [], []
    for f in range(2):
        L, R, _, _ = synthetic_pair((40, 96), disparity=10.0 + 3 * f,
                                    slope=0.03, seed=20 + f)
        Ls.append(L); Rs.append(R)
    lf = jnp.asarray(np.stack(Ls)); rf = jnp.asarray(np.stack(Rs))
    cfg = Config(num_disparities=32, min_disparity=4, paths=8,
                 speckle_window_size=20, frames_per_step=2,
                 backend="pallas")
    got = np.asarray(sgbm_frames(lf, rf, cfg))
    for f in range(2):
        ref = np.asarray(sgbm(jnp.asarray(Ls[f]), jnp.asarray(Rs[f]), cfg))
        np.testing.assert_array_equal(ref, got[f])


@pytest.mark.slow
@pytest.mark.parametrize("swar", [True, False])
def test_sweep_bidir_matches_sequential(rng, swar):
    """The bidirectional vertical-sweep kernel == two sequential sweeps,
    bit for bit, in both the SWAR and v32 branches, incl. frame seams and
    padded scan rows/disparity lanes."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    C = jnp.asarray(rng.integers(0, 25, (16, 64, 128)).astype(np.int8))
    old = sp.SWEEP_SWAR
    sp.SWEEP_SWAR = swar
    jax.clear_caches()
    try:
        for frames, d_real in ((1, 128), (2, 64)):
            kw = dict(p1=10, p2=120, n_real=58, d_real=d_real,
                      frames=frames, interpret=True)
            ref_d = np.asarray(sp.sgm_sweep(C, None, (0, 1, -1), False,
                                            **kw))
            ref_u = np.asarray(sp.sgm_sweep(C, None, (0, 1, -1), True,
                                            **kw))
            Sd, Su = sp.sgm_sweep_bidir(C, (0, 1, -1), 10, 120, n_real=58,
                                        d_real=d_real, frames=frames,
                                        interpret=True)
            sl = np.s_[..., :d_real]
            assert (np.asarray(Sd)[sl] == ref_d[sl]).all(), (swar, frames)
            assert (np.asarray(Su)[sl] == ref_u[sl]).all(), (swar, frames)
    finally:
        sp.SWEEP_SWAR = old
        jax.clear_caches()


def test_transpose_sum_matches_separate(rng):
    from tpustereo.kernels.transpose_pallas import (transpose_hw_pallas,
                                                    transpose_sum_hw_pallas)
    a = jnp.asarray(rng.integers(0, 1000, (24, 48, 128)).astype(np.int16))
    b = jnp.asarray(rng.integers(0, 1000, (24, 48, 128)).astype(np.int16))
    ref = np.asarray(transpose_hw_pallas(a + b, interpret=True, trim=False))
    got = np.asarray(transpose_sum_hw_pallas(a, b, interpret=True,
                                             trim=False))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("d_real", [128, 64])
def test_sweep_bf16_branch_parity(rng, d_real):
    """SWEEP_BF16=True == the default branch on a mixed diagonal sweep
    with scan-axis padding — the bf16 recurrence is exact while
    c_max + p2 <= 255 (see _dir_step_bf16); padded disparity lanes may
    differ between branches (different sentinels), so only the real slice
    compares."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    C = jnp.asarray(rng.integers(0, 25, (16, 64, 128)).astype(np.int8))
    outs = {}
    for flag in (True, False):
        old = sp.SWEEP_BF16
        sp.SWEEP_BF16 = flag
        jax.clear_caches()
        try:
            outs[flag] = np.asarray(sp.sgm_sweep(
                C, None, (0, 1, -1), True, p1=10, p2=120, n_real=58,
                d_real=d_real, c_max=24, interpret=True))
        finally:
            sp.SWEEP_BF16 = old
            jax.clear_caches()
    assert (outs[True][..., :d_real] == outs[False][..., :d_real]).all()


def test_sweep_bf16_ring_carry_parity(rng):
    """bf16 sweeps with the exact ring hand-off: the int32 carry interface
    converts at the kernel boundary (exact — every q value is an integer
    <= c_max+p2). Split a sweep into two init/fin-chained halves under
    each branch; both the outputs and the int32 fin slabs must match the
    default branch bit-for-bit."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    C = jnp.asarray(rng.integers(0, 25, (16, 64, 128)).astype(np.int8))
    outs = {}
    for flag in (True, False):
        old = sp.SWEEP_BF16
        sp.SWEEP_BF16 = flag
        jax.clear_caches()
        try:
            a, fin = sp.sgm_sweep(C[:8], None, (0,), False, p1=10, p2=120,
                                  n_real=64, d_real=128, c_max=24,
                                  return_final_carry=True, interpret=True)
            b = sp.sgm_sweep(C[8:], None, (0,), False, p1=10, p2=120,
                             n_real=64, d_real=128, c_max=24,
                             init_carry=fin, interpret=True)
            outs[flag] = (np.asarray(a), np.asarray(fin), np.asarray(b))
        finally:
            sp.SWEEP_BF16 = old
            jax.clear_caches()
    for x, y in zip(outs[True], outs[False]):
        assert (x == y).all()


@pytest.mark.slow
def test_bwd_wta_bf16_branch_parity(rng):
    """Pin the bwd+WTA kernel's bf16 branch against the default across
    the uniqueness/subpixel matrix, with scan-axis padding (w_real < T)
    exercising the state guard and d_real < D the padded-lane sentinel."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    T, N, D = 128, 32, 128
    Ct = jnp.asarray(rng.integers(0, 25, (T, N, D)).astype(np.int8))
    St = jnp.asarray(rng.integers(0, 500, (T, N, D)).astype(np.int16))
    for d_real in (128, 64):
        for cfg in (Config(num_disparities=d_real),
                    Config(num_disparities=d_real, uniqueness_ratio=0,
                           subpixel=False)):
            outs = {}
            for flag in (True, False):
                old = sp.BWD_BF16
                sp.BWD_BF16 = flag
                jax.clear_caches()
                try:
                    outs[flag] = [np.asarray(v) for v in sp.sweep_bwd_wta(
                        Ct, St, cfg, w_real=120, d_real=d_real,
                        interpret=True)]
                finally:
                    sp.BWD_BF16 = old
                    jax.clear_caches()
            for a, b in zip(outs[True], outs[False]):
                assert (a == b).all()


@pytest.mark.slow
def test_pipeline_bf16_sweeps_match_default(small_pair):
    """Full fused pipeline across the (SWEEP_BF16, BWD_BF16) combo space
    produces identical outputs (explicit flag states, independent of the
    shipped defaults), across 8/4-path and a 9x7 census (c_max=62: the
    largest gated bound)."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    L, R, _, _ = small_pair
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    for kw in ({}, dict(paths=4, census_window=(9, 7)),
               dict(adaptive_p2=True)):
        cfg = Config(num_disparities=32, backend="pallas", **kw)
        old = sp.SWEEP_BF16, sp.BWD_BF16
        outs = []
        try:
            for flags in ((False, False), (True, False), (True, True)):
                sp.SWEEP_BF16, sp.BWD_BF16 = flags
                jax.clear_caches()
                outs.append(np.asarray(sgbm(l8, r8, cfg)))
        finally:
            sp.SWEEP_BF16, sp.BWD_BF16 = old
            jax.clear_caches()
        for got in outs[1:]:
            np.testing.assert_array_equal(outs[0], got)


@pytest.mark.slow
def test_pipeline_bidir_vert_matches_default(small_pair):
    """Full fused pipeline with BIDIR_VERT=True == the sequential-sweep
    default (the toggle changes scheduling, not math)."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    L, R, _, _ = small_pair
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    cfg = Config(num_disparities=32, paths=8, backend="pallas")
    ref = np.asarray(sgbm(l8, r8, cfg))
    old = sp.BIDIR_VERT
    sp.BIDIR_VERT = True
    jax.clear_caches()
    try:
        got = np.asarray(sgbm(l8, r8, cfg))
    finally:
        sp.BIDIR_VERT = old
        jax.clear_caches()
    np.testing.assert_array_equal(ref, got)


@pytest.mark.slow
@pytest.mark.parametrize("D,d0", [(512, 0), (384, 5)])
@pytest.mark.parametrize("mode", ["sgm", "census_wta"])
def test_pipeline_d512_pallas_matches_jnp(mode, D, d0):
    """D up to 512 (four 128-lane blocks; WTA pack shift widens to 9/10
    bits) and a non-power-of-two padded width (384: the circular roll
    tree's wrap overlap is harmless for min). Disparity content spans past
    256 so the upper lane blocks decide real pixels."""
    from tpustereo.data.synthetic import synthetic_pair
    L, R, _, _ = synthetic_pair((16, 640), disparity=300.0, slope=0.05,
                                seed=8)
    l8, r8 = jnp.asarray(L), jnp.asarray(R)
    cfg = Config(mode=mode, num_disparities=D, min_disparity=d0,
                 disp12_max_diff=1, speckle_window_size=20)
    a = np.asarray(sgbm(l8, r8, cfg.replace(backend="jnp")))
    b = np.asarray(sgbm(l8, r8, cfg.replace(backend="pallas")))
    np.testing.assert_array_equal(a, b)
    if mode == "sgm":
        # the high-disparity content must actually be used (raw census
        # WTA leaves the noisy high-d region mostly LR-invalidated, so
        # the content check is meaningful for the aggregated mode only)
        sel = a >= 256
        assert sel.mean() > 0.2, sel.mean()


def test_sweep_p2_layouts_match(rng):
    """Lane-major (T//128, N, 128) vs stacked (T,N,K) vs split
    K x (T,N,1) adaptive-map operands (sgm_pallas.P2_LANE_MAJOR /
    SPLIT_P2) produce identical sweeps, forward and reverse, at
    T > 128 (multiple lane-major blocks)."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.kernels.sgm_pallas import sgm_sweep
    T, N, D = 160, 32, 128
    C = jnp.asarray(rng.integers(0, 25, (T, N, D), dtype=np.int32))
    P2M = jnp.asarray(rng.integers(11, 121, (T, N, 3), dtype=np.int32))
    outs = {}
    old = sp.SPLIT_P2, sp.P2_LANE_MAJOR
    try:
        for name, lm, split in (("lanemajor", True, False),
                                ("stacked", False, False),
                                ("split", False, True)):
            sp.P2_LANE_MAJOR, sp.SPLIT_P2 = lm, split
            jax.clear_caches()
            outs[name] = [np.asarray(sgm_sweep(
                C, None, (0, 1, -1), rev, p1=10, p2=120, n_real=N,
                d_real=D, p2_maps=P2M, interpret=True))
                for rev in (False, True)]
    finally:
        sp.SPLIT_P2, sp.P2_LANE_MAJOR = old
        jax.clear_caches()
    for name in ("stacked", "split"):
        for a, b in zip(outs["lanemajor"], outs[name]):
            np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.slow
def test_sweep_rows_matrix(rng):
    """Row-fattened sweep steps (SWEEP_ROWS, adopted R=4 in r56/57) are
    bit-identical to R=1 for every rows_per_step, including a
    non-divisor request (want=8 on T=20 clamps to the divisor 5 via
    _fit_rows) and the bf16 step (c_max + p2 <= 255 turns SWEEP_BF16
    on — the exact surface the r56 inversion adopted)."""
    from tpustereo.kernels.sgm_pallas import sgm_sweep
    T, N, D = 20, 32, 128
    C = jnp.asarray(rng.integers(0, 25, (T, N, D)).astype(np.int8))
    for c_max in (255, 25):          # 255 keeps bf16 off; 25 turns it on
        for rev in (False, True):
            ref = np.asarray(sgm_sweep(
                C, None, (0, 1, -1), rev, p1=10, p2=120, n_real=28,
                d_real=D, rows_per_step=1, c_max=c_max, interpret=True))
            for want in (2, 4, 8):
                out = np.asarray(sgm_sweep(
                    C, None, (0, 1, -1), rev, p1=10, p2=120, n_real=28,
                    d_real=D, rows_per_step=want, c_max=c_max,
                    interpret=True))
                np.testing.assert_array_equal(
                    out, ref, err_msg=f"R={want} c_max={c_max} rev={rev}")


@pytest.mark.slow
def test_bwd_rows_matrix(rng):
    """Column-fattened bwd+WTA steps (BWD_ROWS, adopted R=8 in r59/60)
    are bit-identical to R=1 across the packing-relevant output maps,
    with scan-axis padding (w_real < T) crossing a step boundary."""
    from tpustereo.kernels.sgm_pallas import sweep_bwd_wta
    T, N, D = 128, 32, 128
    Ct = jnp.asarray(rng.integers(0, 25, (T, N, D)).astype(np.int8))
    St = jnp.asarray(rng.integers(0, 500, (T, N, D)).astype(np.int16))
    cfg = Config()
    ref = [np.asarray(v) for v in sweep_bwd_wta(
        Ct, St, cfg, w_real=120, d_real=D, rows_per_step=1,
        interpret=True)]
    for want in (8, 32):
        out = [np.asarray(v) for v in sweep_bwd_wta(
            Ct, St, cfg, w_real=120, d_real=D, rows_per_step=want,
            interpret=True)]
        for a, b in zip(out, ref):
            np.testing.assert_array_equal(a, b, err_msg=f"R={want}")


@pytest.mark.slow
def test_sweep_lane_major_rows_matrix(rng):
    """ADAPTIVE_SWEEP_ROWS: lane-major adaptive-map sweeps at R in
    {2, 4} are bit-identical to the shipped R=1, forward and reverse,
    at T=256 (two lane-major blocks, so fattened steps cross the
    128-row block boundary) and at a non-divisor request (want=8 on
    T=20 -> _fit_rows 5 -> the 128%R guard walks it down to 4)."""
    import jax
    import tpustereo.kernels.sgm_pallas as sp
    from tpustereo.kernels.sgm_pallas import sgm_sweep
    for T, wants in ((256, (2, 4)), (20, (8,))):
        C = jnp.asarray(rng.integers(0, 25, (T, 32, 128), dtype=np.int32))
        P2M = jnp.asarray(rng.integers(11, 121, (T, 32, 3), dtype=np.int32))
        old = sp.ADAPTIVE_SWEEP_ROWS
        try:
            outs = {}
            for want in (1,) + wants:
                sp.ADAPTIVE_SWEEP_ROWS = want
                jax.clear_caches()
                outs[want] = [np.asarray(sgm_sweep(
                    C, None, (0, 1, -1), rev, p1=10, p2=120, n_real=28,
                    d_real=128, p2_maps=P2M, interpret=True))
                    for rev in (False, True)]
            for want in wants:
                for a, b in zip(outs[want], outs[1]):
                    np.testing.assert_array_equal(
                        a, b, err_msg=f"T={T} R={want}")
        finally:
            sp.ADAPTIVE_SWEEP_ROWS = old
            jax.clear_caches()


def test_sweep_emit_transposed_lane_major_maps(rng):
    """emit_transposed forces R=4, which previously pushed adaptive maps
    onto the stacked fallback layout; with the r61 R>1 lane-major
    support they ride lane-major there — pin the combination against
    the plain sweep's transpose."""
    from tpustereo.kernels.sgm_pallas import sgm_sweep
    T, N, D = 32, 16, 128
    C = jnp.asarray(rng.integers(0, 25, (T, N, D), dtype=np.int32))
    P2M = jnp.asarray(rng.integers(11, 121, (T, N, 3), dtype=np.int32))
    for rev in (False, True):
        ref = np.asarray(sgm_sweep(
            C, None, (0, 1, -1), rev, p1=10, p2=120, n_real=14,
            d_real=D, p2_maps=P2M, interpret=True))
        et = np.asarray(sgm_sweep(
            C, None, (0, 1, -1), rev, p1=10, p2=120, n_real=14,
            d_real=D, p2_maps=P2M, emit_transposed=True, interpret=True))
        np.testing.assert_array_equal(
            np.swapaxes(et.reshape(N, T, D), 0, 1), ref, err_msg=f"rev={rev}")
