"""Feature detection, description, and matching for the odometry backend
(SURVEY.md §3 #19, §4.4) — all jnp, static shapes, jit-able.

TPU-first choices: Harris corner response (dense VPU elementwise + box
sums), top-K selection by global argsort (K static), patch descriptors
matched with ONE (K×K) matrix product on the MXU — brute-force matching is
a matmul, the one genuinely MXU-shaped op in this workload.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shift(x, dy, dx):
    return jnp.roll(x, (dy, dx), (0, 1))


def _box(x, r):
    """(2r+1)² box sum via separable cumsum."""
    k = 2 * r + 1
    p = jnp.pad(x, ((r, r), (r, r)), mode="edge")
    cs = jnp.pad(p.cumsum(0), ((1, 0), (0, 0)))
    v = cs[k:, :] - cs[:-k, :]
    cs = jnp.pad(v.cumsum(1), ((0, 0), (1, 0)))
    return cs[:, k:] - cs[:, :-k]


def harris_response(img: jnp.ndarray, r: int = 2, kappa: float = 0.04) -> jnp.ndarray:
    """Harris corner response. img uint8 (H, W) -> float32 (H, W)."""
    f = img.astype(jnp.float32) / 255.0
    dx = (_shift(f, 0, -1) - _shift(f, 0, 1)) * 0.5
    dy = (_shift(f, -1, 0) - _shift(f, 1, 0)) * 0.5
    sxx, syy, sxy = _box(dx * dx, r), _box(dy * dy, r), _box(dx * dy, r)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - kappa * tr * tr


@partial(jax.jit, static_argnames=("max_corners", "nms_radius", "border"))
def detect_corners(img: jnp.ndarray, max_corners: int = 256,
                   nms_radius: int = 3, border: int = 12,
                   min_response: float = 1e-6):
    """Top-K Harris corners with 3×3+ non-max suppression.

    Returns (pts (K, 2) int32 [y, x], valid (K,) bool), K static.
    """
    H, W = img.shape
    resp = harris_response(img)
    # NMS: keep pixels equal to their neighbourhood max
    k = 2 * nms_radius + 1
    p = jnp.pad(resp, nms_radius, constant_values=-jnp.inf)
    local_max = resp
    for dy in range(k):
        for dx in range(k):
            local_max = jnp.maximum(local_max, p[dy:dy + H, dx:dx + W])
    keep = (resp >= local_max) & (resp > min_response)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inb = (yy >= border) & (yy < H - border) & (xx >= border) & (xx < W - border)
    score = jnp.where(keep & inb, resp, -jnp.inf).reshape(-1)
    # top_k, not argsort(-score)[:K]: selecting K=512 of ~465K pixels is
    # the detector's dominant cost and top_k avoids the full-image sort
    top, idx = jax.lax.top_k(score, max_corners)
    iy, ix = idx // W, idx % W
    valid = top > -jnp.inf

    # subpixel refinement: 1-D parabola fits on the response along y and x
    # (integer corner positions quantise small optical flows — a 2 px
    # inter-frame flow carries ±0.5 px = 25% noise otherwise)
    def paraboloid(m, p, c):
        denom = m - 2.0 * c + p
        off = jnp.where(denom < 0, (m - p) / jnp.where(denom == 0, 1.0,
                                                       2.0 * denom), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    c0 = resp[iy, ix]
    offy = paraboloid(resp[jnp.maximum(iy - 1, 0), ix],
                      resp[jnp.minimum(iy + 1, H - 1), ix], c0)
    offx = paraboloid(resp[iy, jnp.maximum(ix - 1, 0)],
                      resp[iy, jnp.minimum(ix + 1, W - 1)], c0)
    pts = jnp.stack([iy.astype(jnp.float32) + offy,
                     ix.astype(jnp.float32) + offx], -1)
    return pts, valid


@partial(jax.jit, static_argnames=("patch",))
def describe(img: jnp.ndarray, pts: jnp.ndarray, patch: int = 8) -> jnp.ndarray:
    """Normalized intensity-patch descriptors at pts.

    (K, 2) int32 -> (K, patch²) float32, zero-mean unit-norm, so matching
    similarity is NCC via a single matmul.
    """
    H, W = img.shape
    f = img.astype(jnp.float32)
    r = patch // 2
    fp = jnp.pad(f, r, mode="edge")

    ip = jnp.round(pts).astype(jnp.int32)  # pts may be subpixel floats

    def grab(pt):
        return jax.lax.dynamic_slice(fp, (pt[0], pt[1]), (patch, patch))
    patches = jax.vmap(grab)(ip).reshape(pts.shape[0], -1)
    patches = patches - patches.mean(-1, keepdims=True)
    norm = jnp.linalg.norm(patches, axis=-1, keepdims=True)
    return patches / jnp.maximum(norm, 1e-6)


@partial(jax.jit, static_argnames=())
def match_descriptors(da: jnp.ndarray, db: jnp.ndarray,
                      va: jnp.ndarray, vb: jnp.ndarray,
                      min_similarity: float = 0.6):
    """Mutual-nearest-neighbour NCC matching.

    da (K, P), db (K, P) -> (idx_b (K,) int32, good (K,) bool): for each
    valid descriptor in A its mutual best match in B. Similarity is one
    (K×K) matmul on the MXU.
    """
    sim = da @ db.T  # (K, K) NCC in [-1, 1]
    sim = jnp.where(va[:, None] & vb[None, :], sim, -2.0)
    best_ab = jnp.argmax(sim, axis=1)
    best_ba = jnp.argmax(sim, axis=0)
    mutual = best_ba[best_ab] == jnp.arange(da.shape[0])
    strength = jnp.take_along_axis(sim, best_ab[:, None], 1)[:, 0]
    good = mutual & (strength > min_similarity) & va
    return best_ab.astype(jnp.int32), good
