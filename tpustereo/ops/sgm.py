"""Semi-global path aggregation as `lax.scan` directional sweeps — the hot
loop of the framework (SURVEY.md §3 #5, §4.1).

TPU-first design (SURVEY.md §7 hard parts): the recurrence is sequential
along each scanline, so we do NOT fight it with a (min,+) associative scan
(densifies to D×D work per step). Instead each scan step is an elementwise
(N, D) slab op — N the perpendicular axis, D=num_disparities on the VPU
lane dimension — and the 8 directions are independent sweeps XLA can
overlap. Diagonal paths need no shear: scanning over rows, the carry slab
is shifted by ±1 column per step, which turns the diagonal dependency into
a vertical scan with an in-carry roll.

Bit-exact vs `golden.aggregate_numpy` (same recurrence, same conventions).
Path costs are bounded by C_max + P2 (§1.1) so the per-direction output and
the 4/8-path sum are emitted as int16 to halve HBM traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpustereo.config import Config

_BIG = 1 << 24  # plain int: module import must not initialise the backend


def p2_map(img: jnp.ndarray, dy: int, dx: int, cfg: Config) -> jnp.ndarray:
    """Per-pixel P2 for direction r=(dy,dx) (adaptive on left-image gradient,
    mirroring golden._p2_map): P2' = max(P1+1, P2 // max(1, |I(p)-I(p-r)|)).

    The quotient rides f32 division, not integer division (TPU has no
    vector integer divide — XLA emulates it at many ops/element, and the
    8 directional maps are traced into the on-chip pipeline). Exact:
    for 0 < g <= 255 and P2 < 2^24, the true quotient q = P2/g satisfies
    |q - fl(q)| <= ulp(q)/2 < 1/g (since q*g = P2 < 2^24), so the
    correctly-rounded f32 division can never cross an integer boundary —
    floor(fl(q)) == P2 // g, verified exhaustively over the full
    (P2 <= 4095) x (g <= 255) domain in tests/test_ops_parity.py."""
    H, W = img.shape
    if not cfg.adaptive_p2:
        return jnp.full((H, W), cfg.p2, jnp.int32)
    ii = img.astype(jnp.int32)
    grad = jnp.zeros((H, W), jnp.int32)
    ys = slice(max(dy, 0), H + min(dy, 0))
    xs = slice(max(dx, 0), W + min(dx, 0))
    ys_src = slice(max(-dy, 0), H + min(-dy, 0))
    xs_src = slice(max(-dx, 0), W + min(-dx, 0))
    grad = grad.at[ys, xs].set(jnp.abs(ii[ys, xs] - ii[ys_src, xs_src]))
    g = jnp.maximum(1, grad).astype(jnp.float32)
    quot = jnp.floor(jnp.float32(cfg.p2) / g).astype(jnp.int32)
    return jnp.maximum(cfg.p1 + 1, quot)


def _sweep(C: jnp.ndarray, p2m: jnp.ndarray, p1: int, dx: int,
           init_carry: jnp.ndarray | None = None,
           return_carry: bool = False):
    """Generic forward sweep over axis 0.

    C: (T, N, D) int32 raw costs, p2m: (T, N) int32. `dx` is the in-carry
    shift per step (0 for axial paths, ±1 for diagonals). `init_carry` lets
    the distributed ring hand-off seed the first step with a neighbour
    chip's final carry slab (SURVEY.md §4.3b); None means path start.
    Returns (T, N, D) int16 path costs (and the final carry if asked).
    """
    T, N, D = C.shape
    p1_ = jnp.int32(p1)
    if dx == 0:
        has_prev = None
    elif dx > 0:
        has_prev = (jnp.arange(N) >= dx)[:, None]
    else:
        has_prev = (jnp.arange(N) < N + dx)[:, None]

    def step(prev, xt):
        c, p2 = xt
        if dx > 0:
            sh = jnp.concatenate([jnp.full((dx, D), _BIG), prev[:-dx]], 0)
        elif dx < 0:
            sh = jnp.concatenate([prev[-dx:], jnp.full((-dx, D), _BIG)], 0)
        else:
            sh = prev
        minprev = sh.min(axis=-1)
        up = jnp.concatenate([sh[:, 1:], jnp.full((N, 1), _BIG)], -1)
        dn = jnp.concatenate([jnp.full((N, 1), _BIG), sh[:, :-1]], -1)
        cand = jnp.minimum(sh, jnp.minimum(up, dn) + p1_)
        cand = jnp.minimum(cand, (minprev + p2)[:, None])
        L = c + cand - minprev[:, None]
        if has_prev is not None:
            L = jnp.where(has_prev, L, c)
        return L, L.astype(jnp.int16)

    if init_carry is None:
        L0 = C[0]
        carry, rest = jax.lax.scan(step, L0, (C[1:], p2m[1:]))
        out = jnp.concatenate([L0.astype(jnp.int16)[None], rest], axis=0)
    else:
        carry, out = jax.lax.scan(step, init_carry.astype(jnp.int32),
                                  (C, p2m))
    if return_carry:
        return out, carry
    return out


def aggregate_path(C: jnp.ndarray, dy: int, dx: int, cfg: Config,
                   img: jnp.ndarray,
                   init_carry: jnp.ndarray | None = None,
                   return_carry: bool = False,
                   p2m: jnp.ndarray | None = None):
    """L_r for direction r=(dy,dx). C: (H, W, D) any int dtype -> int16.

    Layout strategy: horizontal paths scan over x with an (H, D) carry
    (transpose), vertical/diagonal paths scan over y with a (W, D) carry;
    reverse directions flip the scan axis. The in-carry column shift `dx`
    is sign-preserved under the y-flip (predecessor (y+1, x-1) becomes
    (y'-1, x-1) in flipped coordinates).
    """
    Ci = C.astype(jnp.int32)
    if p2m is None:
        p2m = p2_map(img, dy, dx, cfg)
    if dy == 0:
        # scan over x: (W, H, D)
        Ct = Ci.transpose(1, 0, 2)
        p2t = p2m.T
        if dx < 0:
            Ct, p2t = Ct[::-1], p2t[::-1]
        res = _sweep(Ct, p2t, cfg.p1, 0, init_carry, return_carry)
        out, carry = res if return_carry else (res, None)
        if dx < 0:
            out = out[::-1]
        out = out.transpose(1, 0, 2)
    else:
        Cs, p2s = (Ci, p2m) if dy > 0 else (Ci[::-1], p2m[::-1])
        res = _sweep(Cs, p2s, cfg.p1, dx, init_carry, return_carry)
        out, carry = res if return_carry else (res, None)
        if dy < 0:
            out = out[::-1]
    if return_carry:
        return out, carry
    return out


DIRS_4 = ((0, 1), (0, -1), (1, 0), (-1, 0))
DIRS_8 = DIRS_4 + ((1, 1), (1, -1), (-1, 1), (-1, -1))


def aggregate(C: jnp.ndarray, cfg: Config, img: jnp.ndarray) -> jnp.ndarray:
    """S = Σ_r L_r over 4/8 directions; (H, W, D) int16 (bounded ≤ 8·(C_max+P2))."""
    dirs = DIRS_4 if cfg.paths == 4 else DIRS_8
    S = jnp.zeros(C.shape, jnp.int16)
    for dy, dx in dirs:
        S = S + aggregate_path(C, dy, dx, cfg, img)
    return S
