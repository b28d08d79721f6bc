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
