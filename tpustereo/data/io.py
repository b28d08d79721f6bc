"""Image / disparity-map I/O: PNG/PGM (via cv2), PFM (Middlebury ground
truth), KITTI uint16 disparity PNGs (SURVEY.md §3 #1)."""

from __future__ import annotations

import re

import numpy as np

try:
    import cv2
    HAVE_CV2 = True
except ImportError:  # pragma: no cover
    HAVE_CV2 = False


def read_image_gray(path: str) -> np.ndarray:
    """Load an image as grayscale uint8 (H, W)."""
    assert HAVE_CV2, "cv2 not available"
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.uint8)


def write_image(path: str, img: np.ndarray) -> None:
    assert HAVE_CV2, "cv2 not available"
    if not cv2.imwrite(str(path), img):
        raise IOError(f"failed to write {path}")


# --- PFM (Middlebury float maps) -------------------------------------------

def read_pfm(path: str) -> np.ndarray:
    """Read a PFM file -> float32 (H, W) or (H, W, 3). Rows are stored
    bottom-up in PFM; we return top-down. Uses the native C++ codec
    (native/tpustereo_native.cc) when built; this Python path is the
    fallback and parity target."""
    from tpustereo import native
    if native.available():
        try:
            return native.read_pfm(path)
        except IOError:
            pass  # fall through for precise Python-level errors
    return _read_pfm_py(path)


def _read_pfm_py(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        if header not in (b"PF", b"Pf"):
            raise ValueError(f"not a PFM file: {path}")
        color = header == b"PF"
        dims = f.readline().strip()
        while dims.startswith(b"#"):
            dims = f.readline().strip()
        m = re.match(rb"^(\d+)\s+(\d+)$", dims)
        if not m:
            raise ValueError("malformed PFM dims")
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().strip())
        endian = "<" if scale < 0 else ">"
        count = w * h * (3 if color else 1)
        data = np.frombuffer(f.read(count * 4), dtype=endian + "f4", count=count)
    shape = (h, w, 3) if color else (h, w)
    return np.ascontiguousarray(data.reshape(shape)[::-1]).astype(np.float32)


def write_pfm(path: str, data: np.ndarray) -> None:
    data = np.asarray(data, dtype=np.float32)
    color = data.ndim == 3
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{data.shape[1]} {data.shape[0]}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        f.write(np.ascontiguousarray(data[::-1]).astype("<f4").tobytes())


# --- KITTI disparity PNGs ----------------------------------------------------

def read_kitti_disparity(path: str) -> np.ndarray:
    """KITTI disparity GT: uint16 PNG, value = disparity*256, 0 = invalid.
    Returns float32 with invalid = -1."""
    assert HAVE_CV2, "cv2 not available"
    raw = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise FileNotFoundError(path)
    disp = raw.astype(np.float32) / 256.0
    disp[raw == 0] = -1.0
    return disp


def write_kitti_disparity(path: str, disp: np.ndarray) -> None:
    assert HAVE_CV2, "cv2 not available"
    raw = np.where(disp >= 0, np.clip(disp * 256.0, 1, 65535), 0).astype(np.uint16)
    if not cv2.imwrite(str(path), raw):
        raise IOError(f"failed to write {path}")
