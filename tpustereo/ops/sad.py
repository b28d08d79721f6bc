"""SAD block-matching cost volume (BASELINE config 1), pure jnp.

Mirrors `golden.sad_volume_numpy`: absolute-difference volume (x-d<0 -> 255),
box-summed over block×block with edge-replication padding.

TPU formulation (same discipline as ops/postproc.py): the d-shifted right
image comes from the log-shear `_shift_volume` (ceil(log2 D) static rolls)
instead of a `jnp.take` gather — TPU lowers multi-dim gathers at a fraction
of useful bandwidth — and the box sum is separable binary-decomposed window
sums (sum of 2^k-tap partial sums), gather- and cumsum-free. Integer adds
only, so the result is bit-identical to the golden integral-image form.
"""

from __future__ import annotations

import jax.numpy as jnp


def _window_sum(x: jnp.ndarray, block: int, axis: int) -> jnp.ndarray:
    """out[i] = sum x[i .. i+block-1] along `axis` (callers slice so the
    roll wrap never lands in kept positions). Binary decomposition: build
    2^k-tap sums by doubling, then combine block's set bits."""
    sums = {1: x}
    k = 1
    while k * 2 <= block:
        sums[k * 2] = sums[k] + jnp.roll(sums[k], -k, axis=axis)
        k *= 2
    acc = None
    off = 0
    for k in sorted(sums, reverse=True):
        if block & k:
            part = jnp.roll(sums[k], -off, axis=axis) if off else sums[k]
            acc = part if acc is None else acc + part
            off += k
    return acc


def sad_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int,
               block: int, d_start: int = 0) -> jnp.ndarray:
    """Plane j searches disparity hypothesis d_start + j (min_disparity)."""
    from tpustereo.ops.postproc import _shift_volume

    H, W = left.shape
    li = left.astype(jnp.int32)
    ri = right.astype(jnp.int32)
    G = _shift_volume(ri, num_disp, d_start, jnp.int32(0))      # (H, W, D)
    xs = jnp.arange(W)[:, None]
    ds = d_start + jnp.arange(num_disp)[None, :]
    valid = (xs - ds) >= 0
    A = jnp.where(valid[None], jnp.abs(li[:, :, None] - G), 255)
    r = block // 2
    Ap = jnp.pad(A, ((r, r), (r, r), (0, 0)), mode="edge")
    return _window_sum(_window_sum(Ap, block, 0), block, 1)[:H, :W]
