"""SAD block-matching cost volume (BASELINE config 1), pure jnp.

Mirrors `golden.sad_volume_numpy`: absolute-difference volume (x-d<0 -> 255),
box-summed over block×block with edge-replication padding, via a 2-D cumsum
(integral image) so the cost is O(H·W·D) independent of block size.
"""

from __future__ import annotations

import jax.numpy as jnp


def sad_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int,
               block: int, d_start: int = 0) -> jnp.ndarray:
    """Plane j searches disparity hypothesis d_start + j (min_disparity)."""
    H, W = left.shape
    li = left.astype(jnp.int32)
    ri = right.astype(jnp.int32)
    xs = jnp.arange(W)[:, None]
    ds = d_start + jnp.arange(num_disp)[None, :]
    idx = xs - ds
    valid = idx >= 0
    r_g = jnp.take(ri, jnp.clip(idx, 0, W - 1), axis=1)   # (H, W, D)
    A = jnp.where(valid[None], jnp.abs(li[:, :, None] - r_g), 255)
    r = block // 2
    Ap = jnp.pad(A, ((r, r), (r, r), (0, 0)), mode="edge")
    cs = Ap.cumsum(axis=0).cumsum(axis=1)
    cs = jnp.pad(cs, ((1, 0), (1, 0), (0, 0)))
    return (cs[block:, block:] - cs[:-block, block:]
            - cs[block:, :-block] + cs[:-block, :-block]).astype(jnp.int32)
