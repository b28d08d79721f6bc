"""ctypes bindings for the native C++ runtime components (native/*.cc —
SURVEY.md §3 #1/#8). Builds the shared library on demand with g++ (cached
next to the source); every entry point has a pure-Python fallback, so the
package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC_DIR = os.path.join(_ROOT, "native")
_SRC = os.path.join(_SRC_DIR, "tpustereo_native.cc")
_SRC2 = os.path.join(_SRC_DIR, "loader.cc")
_LIB = os.path.join(_SRC_DIR, "libtpustereo_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _SRC_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or any(
            os.path.exists(s) and os.path.getmtime(s) > os.path.getmtime(_LIB)
            for s in (_SRC, _SRC2)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i32 = ctypes.c_int32

    lib.speckle_filter.argtypes = [f32p, u8p, i32, i32, ctypes.c_float, i32]
    lib.speckle_filter.restype = None
    lib.cc_labels.argtypes = [u8p, u8p, i32, i32, i32p]
    lib.cc_labels.restype = None
    lib.pgm_read_header.argtypes = [ctypes.c_char_p, ctypes.POINTER(i32),
                                    ctypes.POINTER(i32), ctypes.POINTER(i32)]
    lib.pgm_read_header.restype = ctypes.c_int
    lib.pgm_read.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int64]
    lib.pgm_read.restype = ctypes.c_int
    lib.pgm_write.argtypes = [ctypes.c_char_p, u8p, i32, i32]
    lib.pgm_write.restype = ctypes.c_int
    lib.pfm_read_header.argtypes = [ctypes.c_char_p, ctypes.POINTER(i32),
                                    ctypes.POINTER(i32), ctypes.POINTER(i32),
                                    ctypes.POINTER(ctypes.c_float)]
    lib.pfm_read_header.restype = ctypes.c_int
    lib.pfm_read.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64]
    lib.pfm_read.restype = ctypes.c_int
    lib.pfm_write.argtypes = [ctypes.c_char_p, f32p, i32, i32]
    lib.pfm_write.restype = ctypes.c_int
    cpp = ctypes.POINTER(ctypes.c_char_p)
    lib.ts_prefetch_open.argtypes = [cpp, cpp, i32, i32, i32]
    lib.ts_prefetch_open.restype = ctypes.c_void_p
    lib.ts_prefetch_dims.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(i32)] * 4
    lib.ts_prefetch_dims.restype = ctypes.c_int32
    lib.ts_prefetch_take.argtypes = [ctypes.c_void_p, u8p, u8p]
    lib.ts_prefetch_take.restype = ctypes.c_int32
    lib.ts_prefetch_close.argtypes = [ctypes.c_void_p]
    lib.ts_prefetch_close.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


# ---------------------------------------------------------------------------
# high-level wrappers (None / raise on unavailability; callers fall back)
# ---------------------------------------------------------------------------

def speckle_filter(disp: np.ndarray, valid: np.ndarray, speckle_range: float,
                   min_size: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    H, W = disp.shape
    v = np.ascontiguousarray(valid, dtype=np.uint8).copy()
    lib.speckle_filter(np.ascontiguousarray(disp, dtype=np.float32), v,
                       H, W, float(speckle_range), int(min_size))
    return v.astype(bool)


def cc_labels(conn_h: np.ndarray, conn_v: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    H = conn_v.shape[0] + 1
    W = conn_h.shape[1] + 1
    out = np.empty((H, W), np.int32)
    lib.cc_labels(np.ascontiguousarray(conn_h, np.uint8),
                  np.ascontiguousarray(conn_v, np.uint8), H, W, out)
    return out


def read_pgm(path: str) -> np.ndarray:
    lib = load()
    assert lib is not None, "native library unavailable"
    w, h, mx = (ctypes.c_int32(), ctypes.c_int32(), ctypes.c_int32())
    rc = lib.pgm_read_header(path.encode(), ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(mx))
    if rc != 0:
        raise IOError(f"pgm_read_header({path}) -> {rc}")
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.pgm_read(path.encode(), out, out.size)
    if rc != 0:
        raise IOError(f"pgm_read({path}) -> {rc}")
    return out


def write_pgm(path: str, img: np.ndarray) -> None:
    lib = load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, np.uint8)
    rc = lib.pgm_write(path.encode(), img, img.shape[1], img.shape[0])
    if rc != 0:
        raise IOError(f"pgm_write({path}) -> {rc}")


def read_pfm(path: str) -> np.ndarray:
    lib = load()
    assert lib is not None, "native library unavailable"
    w, h, ch = ctypes.c_int32(), ctypes.c_int32(), ctypes.c_int32()
    sc = ctypes.c_float()
    rc = lib.pfm_read_header(path.encode(), ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(ch), ctypes.byref(sc))
    if rc != 0:
        raise IOError(f"pfm_read_header({path}) -> {rc}")
    shape: Tuple[int, ...] = ((h.value, w.value, 3) if ch.value == 3
                              else (h.value, w.value))
    out = np.empty(shape, np.float32)
    rc = lib.pfm_read(path.encode(), out.reshape(-1), out.size)
    if rc != 0:
        raise IOError(f"pfm_read({path}) -> {rc}")
    return out


def write_pfm(path: str, img: np.ndarray) -> None:
    lib = load()
    assert lib is not None, "native library unavailable"
    img = np.ascontiguousarray(img, np.float32)
    assert img.ndim == 2
    rc = lib.pfm_write(path.encode(), img, img.shape[1], img.shape[0])
    if rc != 0:
        raise IOError(f"pfm_write({path}) -> {rc}")


class PrefetchPairs:
    """Iterator over (left, right) uint8 frames decoded ahead of time by the
    native threaded loader (native/loader.cc) — the consumer only blocks
    when decode genuinely lags compute. Supports .pgm and .png (gray)
    files; see `tpustereo.data.prefetch_pairs` for the generic front end
    with a pure-Python fallback."""

    def __init__(self, left_paths, right_paths, depth: int = 2,
                 workers: int = 2):
        lib = load()
        assert lib is not None, "native library unavailable"
        assert len(left_paths) == len(right_paths)
        self._lib = lib
        self._n = len(left_paths)
        self._lp = [p.encode() for p in left_paths]   # keep bytes alive
        self._rp = [p.encode() for p in right_paths]
        LArr = ctypes.c_char_p * self._n
        self._h = lib.ts_prefetch_open(
            ctypes.cast(LArr(*self._lp), ctypes.POINTER(ctypes.c_char_p)),
            ctypes.cast(LArr(*self._rp), ctypes.POINTER(ctypes.c_char_p)),
            self._n, depth, workers)
        if not self._h:
            raise IOError("ts_prefetch_open failed")
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._h is None:
            raise StopIteration
        i32 = ctypes.c_int32
        lh, lw, rh, rw = i32(), i32(), i32(), i32()
        rc = self._lib.ts_prefetch_dims(self._h, *(ctypes.byref(x) for x in
                                                   (lh, lw, rh, rw)))
        if rc == 1:
            self.close()
            raise StopIteration
        if rc != 0:
            idx = self._i
            self.close()
            raise IOError(f"prefetch decode failed at pair {idx}")
        left = np.empty((lh.value, lw.value), np.uint8)
        right = np.empty((rh.value, rw.value), np.uint8)
        rc = self._lib.ts_prefetch_take(self._h, left, right)
        if rc != 0:
            self.close()
            raise IOError("ts_prefetch_take failed")
        self._i += 1
        return left, right

    def close(self):
        if self._h is not None:
            self._lib.ts_prefetch_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
