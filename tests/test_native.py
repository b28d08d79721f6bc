"""Native C++ component tests (native/tpustereo_native.cc via ctypes):
union-find speckle/CC must match the golden NumPy implementations exactly;
PGM/PFM codecs must round-trip and agree with the Python codecs."""

import numpy as np
import pytest

from tpustereo import native
from tpustereo.config import Config
from tpustereo.data import io as pio
from tpustereo.golden import speckle_numpy

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_speckle_matches_golden(rng):
    H, W = 40, 56
    disp = rng.integers(0, 32, (H, W)).astype(np.float32)
    # craft plateaus so components of varying size exist
    disp[5:15, 5:25] = 7.0
    disp[20:23, 30:33] = 19.0
    valid = rng.random((H, W)) > 0.2
    cfg = Config(speckle_window_size=40, speckle_range=2)
    ref = speckle_numpy(disp, valid, cfg)
    out = native.speckle_filter(disp, valid, cfg.speckle_range,
                                cfg.speckle_window_size)
    np.testing.assert_array_equal(ref, out)


def test_cc_labels_match_jnp(rng):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tpustereo.ops.postproc import connected_component_labels
    H, W = 24, 31
    conn_h = rng.random((H, W - 1)) > 0.5
    conn_v = rng.random((H - 1, W)) > 0.5
    ref = np.asarray(connected_component_labels(conn_h, conn_v))
    out = native.cc_labels(conn_h, conn_v)
    np.testing.assert_array_equal(ref, out)


def test_pgm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    p = str(tmp_path / "x.pgm")
    native.write_pgm(p, img)
    np.testing.assert_array_equal(native.read_pgm(p), img)
    # cross-check vs cv2 reader used by the Python loader
    if pio.HAVE_CV2:
        np.testing.assert_array_equal(pio.read_image_gray(p), img)


def test_pfm_roundtrip_and_cross(tmp_path, rng):
    img = rng.random((13, 19)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    native.write_pfm(p, img)
    np.testing.assert_array_equal(native.read_pfm(p), img)
    # native reader reads Python-written files and vice versa
    p2 = str(tmp_path / "y.pfm")
    pio.write_pfm(p2, img)
    np.testing.assert_array_equal(native.read_pfm(p2), img)
    np.testing.assert_array_equal(pio.read_pfm(p), img)


def test_native_prefetch_pairs(tmp_path, rng):
    """Native threaded loader: PGM + PNG pairs decoded in order, matching
    the synchronous readers byte for byte."""
    import numpy as np
    import pytest
    from tpustereo import native
    from tpustereo.data.io import read_image_gray, write_image
    from tpustereo.data.prefetch import prefetch_pairs
    if not native.available():
        pytest.skip("native library unavailable")
    pairs, refs = [], []
    for i in range(6):
        L = rng.integers(0, 256, (17 + i, 23), dtype=np.uint8)
        R = rng.integers(0, 256, (17 + i, 23), dtype=np.uint8)
        ext = ".pgm" if i % 2 == 0 else ".png"
        lp = str(tmp_path / f"l{i}{ext}")
        rp = str(tmp_path / f"r{i}{ext}")
        if ext == ".pgm":
            native.write_pgm(lp, L)
            native.write_pgm(rp, R)
        else:
            write_image(lp, L)
            write_image(rp, R)
        pairs.append((lp, rp))
        refs.append((L, R))
    out = list(prefetch_pairs(pairs, depth=2, workers=3))
    assert len(out) == 6
    for (L, R), (gl, gr) in zip(out, refs):
        np.testing.assert_array_equal(L, gl)
        np.testing.assert_array_equal(R, gr)
    # the native PNG decode must also match the Python reader exactly
    np.testing.assert_array_equal(out[1][0], read_image_gray(pairs[1][0]))


def test_prefetch_generator_fallback(rng):
    """The Python-thread fallback wraps arbitrary generators, preserving
    order and propagating exceptions at the right position."""
    import numpy as np
    import pytest
    from tpustereo.data.prefetch import prefetch_pairs

    def gen():
        for i in range(5):
            yield (np.full((4, 4), i, np.uint8), np.full((4, 4), i, np.uint8))

    out = list(prefetch_pairs(gen(), depth=2))
    assert [int(l[0, 0]) for l, _ in out] == list(range(5))

    def bad():
        yield (np.zeros((2, 2), np.uint8),) * 2
        raise RuntimeError("boom")

    it = prefetch_pairs(bad(), depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
