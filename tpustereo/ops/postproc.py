"""Post-processing: LR consistency check, speckle filter, 3×3 median — all
jit-able jnp (SURVEY.md §3 #7-9).

Speckle is the one irregular algorithm in the pipeline (connected
components). TPU-native formulation: min-label propagation with pointer
jumping (hook + compress) inside a `lax.while_loop` — converges in
O(log(H·W)) gather steps instead of O(diameter) neighbour steps, every
iteration a dense vectorized op. Sizes via one scatter-add, exact parity
with the host union-find in `golden.speckle_numpy`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpustereo.config import Config

_BIG = jnp.int32(1 << 24)


def lr_check(S: jnp.ndarray, disp: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Validity mask from LR consistency (mirrors golden.lr_check_numpy).

    Right disparity from the same aggregated volume via the diagonal
    re-index S_R(y,x,d) = S_L(y,x+d,d) — one gather, no second pass.
    """
    H, W, D = S.shape
    if cfg.disp12_max_diff < 0:
        return jnp.ones((H, W), bool)
    Si = S.astype(jnp.int32)
    xs = jnp.arange(W)[:, None]
    ds = jnp.arange(D)[None, :]
    idx = xs + ds                                   # (W, D)
    in_r = idx <= W - 1
    SR = jnp.take_along_axis(
        Si, jnp.broadcast_to(jnp.clip(idx, 0, W - 1)[None], (H, W, D)), axis=1)
    SR = jnp.where(in_r[None], SR, _BIG)
    d_r = jnp.argmin(SR, axis=-1).astype(jnp.int32)  # (H, W)

    dl = jnp.round(disp).astype(jnp.int32)
    xr = jnp.arange(W)[None, :] - dl
    in_img = xr >= 0
    dr_at = jnp.take_along_axis(d_r, jnp.clip(xr, 0, W - 1), axis=1)
    return in_img & (jnp.abs(dl - dr_at) <= cfg.disp12_max_diff)


def _neighbor_min(lab: jnp.ndarray, conn_h: jnp.ndarray, conn_v: jnp.ndarray):
    """One hook step: take the min label over connected 4-neighbours."""
    H, W = lab.shape
    right = jnp.where(conn_h, lab[:, 1:], _BIG)
    left = jnp.where(conn_h, lab[:, :-1], _BIG)
    down = jnp.where(conn_v, lab[1:, :], _BIG)
    up = jnp.where(conn_v, lab[:-1, :], _BIG)
    out = lab
    out = jnp.minimum(out, jnp.pad(right, ((0, 0), (0, 1)), constant_values=_BIG))
    out = jnp.minimum(out, jnp.pad(left, ((0, 0), (1, 0)), constant_values=_BIG))
    out = jnp.minimum(out, jnp.pad(down, ((0, 1), (0, 0)), constant_values=_BIG))
    out = jnp.minimum(out, jnp.pad(up, ((1, 0), (0, 0)), constant_values=_BIG))
    return out


def connected_component_labels(conn_h: jnp.ndarray, conn_v: jnp.ndarray,
                               max_iters: int | None = None) -> jnp.ndarray:
    """Label 4-connected components given edge-connectivity masks.

    conn_h: (H, W-1) bool, pixel (y,x)~(y,x+1); conn_v: (H-1, W) bool.
    Returns (H, W) int32: min linear index within each component.
    """
    H = conn_v.shape[0] + 1
    W = conn_h.shape[1] + 1
    # `anchor` is a zero derived from the inputs so the while_loop carry has
    # the same varying-manual-axes type as the body output when this runs
    # inside shard_map (unvarying constants would mismatch); outside
    # shard_map it is a plain zero.
    anchor = conn_h.astype(jnp.int32).max() * 0
    init = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + anchor
    if max_iters is None:
        max_iters = H * W  # safe bound; convergence is ~O(log) in practice

    def cond(state):
        lab, changed, i = state
        return changed & (i < max_iters)

    def body(state):
        lab, _, i = state
        new = _neighbor_min(lab, conn_h, conn_v)
        # pointer jumping (compress): label <- label[label], twice
        flat = new.reshape(-1)
        flat = jnp.minimum(flat, flat[flat])
        flat = jnp.minimum(flat, flat[flat])
        new = flat.reshape(H, W)
        return new, jnp.any(new != lab), i + 1

    lab, _, _ = jax.lax.while_loop(
        cond, body, (init, anchor == 0, anchor))
    return lab


def speckle(disp: jnp.ndarray, valid: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Invalidate components smaller than speckle_window_size (mirrors
    golden.speckle_numpy: 4-connectivity, |Δd| <= speckle_range)."""
    if cfg.speckle_window_size <= 0:
        return valid
    H, W = disp.shape
    rng = jnp.float32(cfg.speckle_range)
    conn_h = valid[:, :-1] & valid[:, 1:] & (jnp.abs(disp[:, :-1] - disp[:, 1:]) <= rng)
    conn_v = valid[:-1, :] & valid[1:, :] & (jnp.abs(disp[:-1, :] - disp[1:, :]) <= rng)
    lab = connected_component_labels(conn_h, conn_v)
    sizes = jnp.zeros((H * W,), jnp.int32).at[lab.reshape(-1)].add(1)
    big = sizes[lab.reshape(-1)].reshape(H, W) >= cfg.speckle_window_size
    return valid & big


def median3(disp: jnp.ndarray) -> jnp.ndarray:
    """3×3 median with edge replication (mirrors golden.median3_numpy)."""
    p = jnp.pad(disp, 1, mode="edge")
    H, W = disp.shape
    taps = jnp.stack([p[dy:dy + H, dx:dx + W]
                      for dy in range(3) for dx in range(3)], axis=0)
    return jnp.median(taps, axis=0).astype(disp.dtype)
