"""Public API (SURVEY.md §2.2): `match_pair`, `match_batch`, `run_sequence`.

Thin host-side wrappers: numpy in, numpy out; device placement and jit
compilation handled here so CLI/users never touch JAX directly.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

import tpustereo
from tpustereo.config import Config

tpustereo.enable_compilation_cache()
from tpustereo.pipeline import sgbm, sgbm_batched


def _as_u8(img: np.ndarray) -> jnp.ndarray:
    img = np.asarray(img)
    if img.ndim == 3:  # RGB -> gray (ITU-R 601 integer approximation)
        img = (img @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    return jnp.asarray(img)


def match_pair(left: np.ndarray, right: np.ndarray,
               cfg: Optional[Config] = None) -> np.ndarray:
    """Disparity for one rectified pair. (H, W) uint8 -> (H, W) float32,
    invalid = -1.0 (SURVEY.md §4.1)."""
    cfg = cfg or Config()
    return np.asarray(sgbm(_as_u8(left), _as_u8(right), cfg))


def match_batch(lefts: np.ndarray, rights: np.ndarray,
                cfg: Optional[Config] = None) -> np.ndarray:
    """Disparity for a batch of pairs. (B, H, W) -> (B, H, W) float32."""
    cfg = cfg or Config()
    l = jnp.asarray(np.asarray(lefts, dtype=np.uint8))
    r = jnp.asarray(np.asarray(rights, dtype=np.uint8))
    return np.asarray(sgbm_batched(l, r, cfg))


def match_pair_tiled(left: np.ndarray, right: np.ndarray, cfg: Config,
                     mesh=None) -> np.ndarray:
    """Strip-tiled match_pair: rows sharded over the mesh 'strip' axis
    (SURVEY.md §4.3). mesh defaults to a 1×strips ('data','strip') mesh
    over the available devices."""
    from tpustereo.dist import make_mesh, sgbm_tiled
    if mesh is None:
        mesh = make_mesh(data=1, strip=cfg.strips)
    return np.asarray(sgbm_tiled(_as_u8(left), _as_u8(right), cfg, mesh))


def run_sequence(pairs: Iterable, calib, cfg: Optional[Config] = None,
                 odometry_cfg=None, mesh=None):
    """Stereo odometry over an iterable of (left, right) frames
    (SURVEY.md §4.4). With cfg.strips > 1 each frame's disparity comes from
    the strip-tiled distributed pipeline (BASELINE config 5). Returns the
    trajectory as (N, 4, 4) poses."""
    from tpustereo.odometry import StereoOdometry  # lazy: optional subsystem
    cfg = cfg or Config()
    odo = StereoOdometry(calib, cfg, odometry_cfg, mesh=mesh)
    for left, right in pairs:
        odo.step(np.asarray(left), np.asarray(right))
    return odo.trajectory()
