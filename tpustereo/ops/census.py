"""Census transform + Hamming cost volume, pure jnp (XLA) implementation.

Mirrors `tpustereo.golden.sgbm_numpy` bit-for-bit (same window ordering,
edge-replication padding, out-of-range convention). Census bits are packed
into uint32 planes — (H, W, P) with P = ceil(bits/32) — because JAX runs
without x64 by default and the TPU VPU is 32-bit; the standard 5×5 window
(24 bits) uses a single plane.

Pallas kernels for the hot path live in `tpustereo.kernels`; this module is
the always-correct fallback and the parity target.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpustereo.utils.shapes import ceil_div


def census(img: jnp.ndarray, window=(5, 5)) -> jnp.ndarray:
    """(H, W) uint8 -> (H, W, P) uint32 census bitplanes.

    Bit k (row-major over the window, center excluded) of plane k//32 is set
    iff neighbour < center. Borders use edge replication.
    """
    ch, cw = window
    ry, rx = ch // 2, cw // 2
    nbits = ch * cw - 1
    planes = ceil_div(nbits, 32)
    H, W = img.shape
    pad = jnp.pad(img, ((ry, ry), (rx, rx)), mode="edge")
    center = img
    out = [jnp.zeros((H, W), jnp.uint32) for _ in range(planes)]
    bit = 0
    for dy in range(-ry, ry + 1):
        for dx in range(-rx, rx + 1):
            if dy == 0 and dx == 0:
                continue
            q = jax.lax.dynamic_slice(pad, (ry + dy, rx + dx), (H, W))
            b = (q < center).astype(jnp.uint32) << jnp.uint32(bit % 32)
            out[bit // 32] = out[bit // 32] | b
            bit += 1
    return jnp.stack(out, axis=-1)


def cost_volume(cen_l: jnp.ndarray, cen_r: jnp.ndarray, num_disp: int,
                max_cost: int, d_start=0) -> jnp.ndarray:
    """C[y,x,d] = popcount(cenL[y,x] ^ cenR[y,x-(d_start+d)]); out-of-image
    -> max_cost.

    (H, W, P) uint32 planes -> (H, W, D) uint8. One gather along x builds
    all D shifted right-census views; XLA fuses xor+popcount+sum into it.
    d_start (static or traced) supports disparity-axis sharding
    (dist.disp_shard): each chip builds only its D-slice.
    """
    H, W, P = cen_l.shape
    xs = jnp.arange(W)[:, None]
    ds = d_start + jnp.arange(num_disp)[None, :]
    idx = xs - ds                       # (W, D)
    valid = idx >= 0
    idx_c = jnp.clip(idx, 0, W - 1)
    # gathered[y, x, d, p] = cenR[y, x-d, p]
    gathered = jnp.take(cen_r, idx_c, axis=1)           # (H, W, D, P)
    x = cen_l[:, :, None, :] ^ gathered                  # (H, W, D, P)
    pc = jax.lax.population_count(x).astype(jnp.uint8).sum(
        axis=-1, dtype=jnp.uint8)                        # (H, W, D)
    return jnp.where(valid[None, :, :], pc, jnp.uint8(max_cost))
