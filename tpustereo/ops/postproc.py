"""Post-processing: LR consistency check, speckle filter, 3×3 median — all
jit-able jnp (SURVEY.md §3 #7-9), formulated gather-free for TPU.

TPU reality (measured on the dev chip, see git history): XLA lowers large
multi-dim gathers (`take_along_axis` over a volume axis) and per-element
scatter loops catastrophically — the original gather-based LR check cost
840 ms/frame and pointer-jumping connected components 430 ms/frame at KITTI
size, dwarfing the actual SGM math (46 ms). Everything here is therefore
expressed as static slices, shifts, reductions and `associative_scan`s,
which XLA fuses into dense vector code.

Speckle is the one irregular algorithm in the pipeline (connected
components). TPU-native formulation: segmented min-propagation along rows
and columns via `lax.associative_scan` (each sweep propagates labels through
an entire connected run in one log-depth dense pass), iterated to
convergence in a `lax.while_loop` — the iteration count is the number of
bends in the worst component path, typically <10, vs O(diameter) for
neighbour propagation. Exact parity with the host union-find in
`golden.speckle_numpy`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpustereo.config import Config

_BIG = 1 << 24  # plain int: module import must not initialise the backend


# ---------------------------------------------------------------------------
# LR consistency check
# ---------------------------------------------------------------------------

def _log_shear(A: jnp.ndarray, up: bool) -> jnp.ndarray:
    """Lane-dependent shift along axis 1 of (H, X, D): out[:, u, j] =
    A[:, u+j, j] (up) or A[:, u-j, j] (down), composed from ceil(log2 D)
    static rolls — the jnp-level analog of the Pallas kernels' shear trick.
    Wrapped elements are junk; callers pad axis 1 so every index they keep
    resolves inside the unwrapped region."""
    D = A.shape[2]
    lane = jnp.arange(D, dtype=jnp.int32)
    for b in range(max(1, (D - 1).bit_length())):
        sh = -(1 << b) if up else (1 << b)
        A = jnp.where(((lane >> b) & 1) == 1, jnp.roll(A, sh, axis=1), A)
    return A


def _shift_volume(v: jnp.ndarray, D: int, min_disp: int,
                  fill: jnp.ndarray) -> jnp.ndarray:
    """G[y, x, j] = v[y, x - (min_disp + j)], `fill` where x - d < 0.
    Log-shear (ceil(log2 D) rolls) instead of one unrolled static shift per
    disparity — the unrolled form carried D slice/select ops and dominated
    fallback-path compile time on the 5-30-min remote-compile box."""
    H, W = v.shape
    pad = min_disp + D
    vp = jnp.concatenate([jnp.full((H, pad), fill, v.dtype), v], axis=1)
    G = _log_shear(jnp.broadcast_to(vp[:, :, None], (H, W + pad, D)),
                   up=False)
    return G[:, pad - min_disp: pad - min_disp + W]


def _right_disparity(S: jnp.ndarray, min_disp: int = 0) -> jnp.ndarray:
    """argmin_j S(y, x+d, j), d = min_disp + j — right-view WTA from the
    same aggregated volume via the diagonal re-index (mirrors
    golden.lr_check_numpy). Returns the disparity in true pixel units.

    Gather-free: the diagonal re-index T[y, x, j] = S[y, x+min_disp+j, j]
    is a log-shear (ceil(log2 D) rolls), then one min-reduce with (value,
    index) packed into a single int32 so ties break toward the smallest d
    exactly like argmin."""
    from tpustereo.ops.wta import next_pow2
    H, W, D = S.shape
    big = jnp.int32(1 << 20)
    # packing factor scales with D (a fixed 256 silently corrupted D > 256)
    shift = next_pow2(max(D, 2))
    pad = min_disp + D
    Sp = jnp.concatenate([S.astype(jnp.int32),
                          jnp.full((H, pad, D), big, jnp.int32)], axis=1)
    T = _log_shear(Sp, up=True)[:, min_disp: min_disp + W]
    lane = jnp.arange(D, dtype=jnp.int32)
    packed_best = jnp.min(T * shift + lane, axis=2)
    return (packed_best & (shift - 1)) + min_disp


def dr_consistency(d_r: jnp.ndarray, disp: jnp.ndarray, num_disp: int,
                   max_diff: int, min_disp: int = 0) -> jnp.ndarray:
    """|d_L(x) - d_R(x - round(d_L(x)))| <= max_diff given a precomputed
    right-disparity map. Gather-free: the per-pixel lookup rides the sheared
    G[y, x, j] = d_R(x - min_disp - j) volume (`_shift_volume`), selected at
    lane round(d_L) by a masked min-reduce; the _BIG fill makes
    out-of-image lookups (x < d_L) fail the check, which doubles as the
    in-image condition. (_BIG, not a small in-range sentinel: a 255 fill
    collided with the legitimate d_r == 255 at num_disp == 256 and let
    |d - 255| pass the check near d = 255 for larger D.)"""
    H, W = d_r.shape
    dl = jnp.round(disp).astype(jnp.int32)
    G = _shift_volume(d_r.astype(jnp.int32), num_disp, min_disp,
                      jnp.int32(_BIG))
    lane = jnp.arange(num_disp, dtype=jnp.int32) + min_disp
    diff = jnp.min(jnp.where(dl[:, :, None] == lane, jnp.abs(lane - G),
                             jnp.int32(_BIG)), axis=2)
    return diff <= max_diff


def lr_check(S: jnp.ndarray, disp: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Validity mask: |d_L(x) - d_R(x - round(d_L(x)))| <= disp12_max_diff."""
    H, W, D = S.shape
    if cfg.disp12_max_diff < 0:
        return jnp.ones((H, W), bool)
    d_r = _right_disparity(S, cfg.min_disparity)
    return dr_consistency(d_r, disp, D, cfg.disp12_max_diff,
                          cfg.min_disparity)


# ---------------------------------------------------------------------------
# speckle filter (connected components via segmented scans)
# ---------------------------------------------------------------------------

def _segmented_min_scan(lab: jnp.ndarray, conn: jnp.ndarray, axis: int,
                        reverse: bool) -> jnp.ndarray:
    """Propagate min labels along `axis` through connected runs.

    conn[i] connects element i to element i+1 along the axis (shape is one
    shorter on that axis). Segmented-scan combine (associative):
    (v1,s1) • (v2,s2) = (v2 if s2 else min(v1,v2), s1|s2) with s = 'segment
    starts here'.
    """
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 0) if not reverse else (0, 1)
    start = jnp.pad(~conn, pad, constant_values=True)

    def combine(a, b):
        av, as_ = a
        bv, bs = b
        return jnp.where(bs, bv, jnp.minimum(av, bv)), as_ | bs

    out, _ = jax.lax.associative_scan(combine, (lab, start), axis=axis,
                                      reverse=reverse)
    return out


def connected_component_labels(conn_h: jnp.ndarray, conn_v: jnp.ndarray,
                               max_iters: int | None = None,
                               init_labels: jnp.ndarray | None = None) -> jnp.ndarray:
    """Label 4-connected components given edge-connectivity masks.

    conn_h: (H, W-1) bool, pixel (y,x)~(y,x+1); conn_v: (H-1, W) bool.
    Returns (H, W) int32: min linear index within each component.

    init_labels: optional starting labelling. Min-propagation converges to
    the per-component minimum of the INITIAL labels, so any labelling whose
    component-min equals the component's min linear index yields the exact
    result — e.g. per-band converged labels (kernels.cc_pallas banded mode),
    which cut the remaining rounds to the few cross-band merges.
    """
    H = conn_v.shape[0] + 1
    W = conn_h.shape[1] + 1
    # `anchor` is a zero derived from the inputs so the while_loop carry has
    # the same varying-manual-axes type as the body output when this runs
    # inside shard_map (unvarying constants would mismatch); outside
    # shard_map it is a plain zero.
    anchor = conn_h.astype(jnp.int32).max() * 0
    if init_labels is not None:
        init = init_labels.astype(jnp.int32) + anchor
    else:
        init = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + anchor
    if max_iters is None:
        # provably safe bound: min-label propagation strictly decreases the
        # label sum on any change, so it converges within H*W rounds; the
        # `changed` early-exit keeps typical images at <10 iterations.
        # (The previous H+W bound silently failed to converge on high-bend
        # components — each row+col sweep pair only crosses ~2 bends, and a
        # Hilbert-curve-shaped component has O(H*W) bends.)
        max_iters = H * W

    def cond(state):
        lab, changed, i = state
        return changed & (i < max_iters)

    conn_v_t = conn_v.T  # column scans run lane-major via transposes:
    # an axis-0 associative_scan is ~7x slower than axis-1 on TPU (measured)

    def body(state):
        lab, _, i = state
        new = _segmented_min_scan(lab, conn_h, axis=1, reverse=False)
        new = _segmented_min_scan(new, conn_h, axis=1, reverse=True)
        nt = new.T
        nt = _segmented_min_scan(nt, conn_v_t, axis=1, reverse=False)
        nt = _segmented_min_scan(nt, conn_v_t, axis=1, reverse=True)
        new = nt.T
        return new, jnp.any(new != lab), i + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (init, anchor == 0, anchor))
    return lab


# XLA's associative_scan compiles pathologically on the TPU beyond ~2M
# elements (measured: component_big at 4.5M sat >40 min in the remote
# compiler while the 4.5M lax.sort alone took 16.5 s — the whole
# 1500x3000 pipeline program exceeded 2 h in two attempts). Above the
# gate, running max/min scans run as a static Hillis-Steele loop instead:
# ~log2(n) concat+extreme pairs of trivial IR; O(n log n) work is fine at
# the sizes involved and it only engages where associative_scan is
# unusable anyway.
_ASSOC_SCAN_MAX_N = 1 << 21


def _running_scan(v: jnp.ndarray, op, fill, reverse: bool = False):
    (n,) = v.shape
    if n <= _ASSOC_SCAN_MAX_N:
        return jax.lax.associative_scan(op, v, reverse=reverse)
    s = 1
    while s < n:
        pad = jnp.full((s,), fill, v.dtype)
        sh = (jnp.concatenate([v[s:], pad]) if reverse
              else jnp.concatenate([pad, v[:-s]]))
        v = op(v, sh)
        s <<= 1
    return v


def component_sizes(lab: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel size of the pixel's component, given any component-constant
    labelling. Scatter/gather-free (TPU lowers both badly — the .at[].add
    histogram + lookup measured 9.7 ms at KITTI size vs ~4 ms for this):
    sort labels (carrying source indices), run lengths via cummax/cummin of
    run boundary positions, then a second sort on the source indices carries
    the counts back — a sort is the one fast "permutation" op on TPU.

    All sorts here are is_stable=False: run boundaries depend only on the
    keys, every pixel of a run receives the same count/bit regardless of
    payload order, and the distribute sorts have distinct keys (si is a
    permutation) — stability buys nothing and XLA may sort cheaper."""
    H, W = lab.shape
    n = H * W
    flat = lab.reshape(-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    sl, si = jax.lax.sort((flat, idx), num_keys=1, is_stable=False)
    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    is_end = jnp.concatenate([sl[1:] != sl[:-1], jnp.ones((1,), bool)])
    spos = _running_scan(jnp.where(is_start, pos, -1), jnp.maximum, -1)
    epos = _running_scan(jnp.where(is_end, pos, n), jnp.minimum, n,
                         reverse=True)
    count = epos - spos + 1
    _, out = jax.lax.sort((si, count), num_keys=1, is_stable=False)
    return out.reshape(H, W)


def component_big(lab: jnp.ndarray, thresh: int, use_pallas: bool = False,
                  interpret: bool = False) -> jnp.ndarray:
    """Per-pixel mask 'my component has >= thresh pixels' — what speckle
    actually consumes. Same run-length machinery as `component_sizes`, but
    the distribute-back needs only ONE bit, so it rides the sort key
    (si*2 + big) and the second sort is payload-free — measurably cheaper
    than carrying a full int32 count payload (the double-sort was over half
    the speckle stage's cost at KITTI size).

    use_pallas: ride the in-VMEM bitonic kernel for both sorts when the
    image fits its VMEM budget (lax.sort is flat ~2.4-2.7 ms regardless of
    shape on the dev chip — scripts/tpu_r16_results.json); falls back to
    lax.sort transparently for oversized images."""
    from tpustereo.kernels.bitonic_pallas import (bitonic_feasible,
                                                  bitonic_sort_pallas)
    H, W = lab.shape
    n = H * W
    flat = lab.reshape(-1)
    idx = jnp.arange(n, dtype=jnp.int32)
    if use_pallas and bitonic_feasible(n, True):
        sl, si = bitonic_sort_pallas(flat, idx, interpret=interpret)
    else:
        sl, si = jax.lax.sort((flat, idx), num_keys=1, is_stable=False)
    pos = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    is_end = jnp.concatenate([sl[1:] != sl[:-1], jnp.ones((1,), bool)])
    spos = _running_scan(jnp.where(is_start, pos, -1), jnp.maximum, -1)
    epos = _running_scan(jnp.where(is_end, pos, n), jnp.minimum, n,
                         reverse=True)
    big = (epos - spos + 1) >= thresh
    if SCATTER_DISTRIBUTE:
        out = jnp.zeros((n,), bool).at[si].set(
            big, unique_indices=True, indices_are_sorted=False,
            mode="promise_in_bounds")
        return out.reshape(H, W)
    packed = si * 2 + big.astype(jnp.int32)
    if use_pallas and bitonic_feasible(n, False):
        out = bitonic_sort_pallas(packed, interpret=interpret)
    else:
        out = jax.lax.sort(packed, is_stable=False)
    return (out & 1).astype(bool).reshape(H, W)


def speckle_labels(disp: jnp.ndarray, valid: jnp.ndarray,
                   cfg: Config) -> jnp.ndarray:
    """Connected-component labels of the speckle graph (4-connectivity,
    valid pixels, |Δd| <= speckle_range): min linear index per component."""
    rng = jnp.float32(cfg.speckle_range)
    conn_h = valid[:, :-1] & valid[:, 1:] & (jnp.abs(disp[:, :-1] - disp[:, 1:]) <= rng)
    conn_v = valid[:-1, :] & valid[1:, :] & (jnp.abs(disp[:-1, :] - disp[1:, :]) <= rng)
    from tpustereo.utils.backend import pallas_mode
    mode = pallas_mode(cfg)
    if mode != "off":
        # handles oversized images itself (banded bands + jnp refinement)
        from tpustereo.kernels import connected_component_labels_pallas
        return connected_component_labels_pallas(
            conn_h, conn_v, interpret=(mode == "interpret"))
    return connected_component_labels(conn_h, conn_v)


# Bitonic speckle sorts: measured SLOWER than lax.sort on chip (r20:
# pair sort 3.67 ms vs lax 1.77 ms at 465K; in-context speckle 21.5 ms vs
# 12.5 ms per 4 KITTI frames — the r16 lax.sort calibration that motivated
# the kernel did not hold for the flat 1-D shape). Kept as an opt-in for
# re-measurement on other chips/toolchains; lax.sort is the default.
BITONIC_SPECKLE = False

# Single-sort speckle (VERDICT r2 #4): replace `component_big`'s payload-
# free SECOND sort (the distribute-back) with the inverse-permutation
# scatter out[si] = big — si is a permutation, so the scatter has unique,
# in-bounds indices (the strongest hints XLA accepts). Whether XLA's TPU
# scatter beats its sort for a pure permutation is the measurement this
# toggle exists for; flip + jax.clear_caches() for the on-chip A/B.
SCATTER_DISTRIBUTE = False


def speckle(disp: jnp.ndarray, valid: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Invalidate components smaller than speckle_window_size (mirrors
    golden.speckle_numpy: 4-connectivity, |Δd| <= speckle_range)."""
    if cfg.speckle_window_size <= 0:
        return valid
    from tpustereo.utils.backend import pallas_mode
    mode = pallas_mode(cfg)
    lab = speckle_labels(disp, valid, cfg)
    big = component_big(lab, cfg.speckle_window_size,
                        use_pallas=(mode != "off" and BITONIC_SPECKLE),
                        interpret=(mode == "interpret"))
    return valid & big


def component_big_frames(labs: jnp.ndarray, thresh: int) -> jnp.ndarray:
    """`component_big` over (F, H, W) per-frame labellings with ONE
    batched-axis lax.sort pair per stage (sorts along the last axis of
    (F, n) — shallower network than sorting the F*n concatenation, no
    cross-frame label offsets). Bit-exact vs per-frame `component_big`."""
    F, H, W = labs.shape
    n = H * W
    flat = labs.reshape(F, n)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (F, n))
    sl, si = jax.lax.sort((flat, idx), dimension=-1, num_keys=1,
                          is_stable=False)
    pos = idx
    ones = jnp.ones((F, 1), bool)
    is_start = jnp.concatenate([ones, sl[:, 1:] != sl[:, :-1]], axis=1)
    is_end = jnp.concatenate([sl[:, 1:] != sl[:, :-1], ones], axis=1)
    spos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, -1), axis=1)
    epos = jax.lax.associative_scan(
        jnp.minimum, jnp.where(is_end, pos, n), reverse=True, axis=1)
    big = (epos - spos + 1) >= thresh
    out = jax.lax.sort(si * 2 + big.astype(jnp.int32), dimension=-1,
                       is_stable=False)
    return (out & 1).astype(bool).reshape(F, H, W)


def speckle_frames(disp: jnp.ndarray, valid: jnp.ndarray,
                   cfg: Config) -> jnp.ndarray:
    """`speckle` over (F, H, W) stacked frames.

    With the bitonic kernel feasible at one frame's size, each frame runs
    its own in-VMEM `component_big` (per-frame labels are already
    independent — no offsets needed). Otherwise the frames share ONE
    lax.sort set: labels offset by f*H*W so they never collide, and
    `component_big` — whose two global sorts are the expensive half of
    speckle (r13/r14) — runs once over the stacked labelling. Exact either
    way: sizes are per-component regardless of array shape."""
    if cfg.speckle_window_size <= 0:
        return valid
    from tpustereo.kernels.bitonic_pallas import bitonic_feasible
    from tpustereo.utils.backend import pallas_mode
    F, H, W = disp.shape
    mode = pallas_mode(cfg)
    if mode != "off" and BITONIC_SPECKLE and bitonic_feasible(H * W, True):
        bigs = [component_big(speckle_labels(disp[f], valid[f], cfg),
                              cfg.speckle_window_size, use_pallas=True,
                              interpret=(mode == "interpret"))
                for f in range(F)]
        return valid & jnp.stack(bigs)
    # One flat lax.sort pair over the F*n concatenation with per-frame
    # label offsets. The batched-axis (F, n) form (component_big_frames)
    # measured 1.65 ms/frame SLOWER on chip despite its shallower per-row
    # network (r23: 17.03 vs 15.38 ms at KITTI F=4 b16) — XLA's TPU sort
    # runs the flat shape better; r22 differencing puts these sorts at
    # 2.82 ms/frame, ~all of speckle's cost.
    assert F * H * W < (1 << 31)
    labs = [speckle_labels(disp[f], valid[f], cfg) + f * (H * W)
            for f in range(F)]
    big = component_big(jnp.concatenate(labs, axis=0),
                        cfg.speckle_window_size)
    return valid & big.reshape(F, H, W)


# ---------------------------------------------------------------------------
# gap filling
# ---------------------------------------------------------------------------

def fill_background(disp: jnp.ndarray) -> jnp.ndarray:
    """Fill invalid (-1) pixels with the lower of the nearest valid left and
    right row neighbours (mirrors `golden.fill_background_numpy` — the
    Hirschmüller occlusion rule: occluded pixels take the background, i.e.
    smaller, disparity). Gather-free: two log-depth 'hold last valid'
    segmented propagations via `lax.associative_scan`."""
    valid = disp >= 0

    def combine(a, b):
        av, ah = a
        bv, bh = b
        return jnp.where(bh, bv, av), ah | bh

    lv, lh = jax.lax.associative_scan(combine, (disp, valid), axis=1)
    rv, rh = jax.lax.associative_scan(combine, (disp, valid), axis=1,
                                      reverse=True)
    fill = jnp.where(lh & rh, jnp.minimum(lv, rv),
                     jnp.where(lh, lv, jnp.where(rh, rv, jnp.float32(-1.0))))
    return jnp.where(valid, disp, fill)


_FBIG = 1e30  # "no valid value found" sentinel; sorts after any disparity


def lr_hits(d_r: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Epipolar-intersection map for occlusion/mismatch classification
    (mirrors `golden.lr_hits_numpy`): hits[y,x] ⇔ ∃ d in the search range
    with x-d >= 0 and |d_R(y, x-d) - d| <= disp12_max_diff. Gather-free:
    one compare over the sheared G[y, x, j] = d_R(x - d) volume
    (`_shift_volume`), OR-reduced over j; the _BIG fill makes out-of-image
    lookups miss, doubling as the x-d >= 0 condition."""
    H, W = d_r.shape
    diff = max(cfg.disp12_max_diff, 0)
    G = _shift_volume(d_r.astype(jnp.int32), cfg.num_disparities,
                      cfg.min_disparity, jnp.int32(_BIG))
    lane = jnp.arange(cfg.num_disparities, dtype=jnp.int32) + cfg.min_disparity
    return jnp.any(jnp.abs(G - lane) <= diff, axis=2)


def lr_hits_from_volume(S: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """`lr_hits` for callers that have the aggregated volume but no
    right-disparity map (the non-fused pipeline paths). The duplicate
    `_right_disparity` with `lr_check` is CSE'd by XLA (pure, same args)."""
    return lr_hits(_right_disparity(S, cfg.min_disparity), cfg)


def _hold_last_valid(disp: jnp.ndarray, valid: jnp.ndarray,
                     reverse: bool) -> jnp.ndarray:
    """Per pixel: the nearest valid disparity strictly toward lower x
    (reverse=False) or higher x (reverse=True) — evaluated inclusively, so
    at a *valid* pixel it returns the pixel itself (callers only consume it
    at invalid pixels, where inclusive == the ray from the neighbour on).
    _FBIG where the ray leaves the image without meeting a valid pixel."""

    def combine(a, b):
        av, ah = a
        bv, bh = b
        return jnp.where(bh, bv, av), ah | bh

    v, h = jax.lax.associative_scan(combine, (disp, valid), axis=1,
                                    reverse=reverse)
    return jnp.where(h, v, jnp.float32(_FBIG))


def _hold_diag(disp: jnp.ndarray, valid: jnp.ndarray, dy: int,
               dx: int) -> jnp.ndarray:
    """Nearest valid disparity along the diagonal ray (dy, dx) from each
    pixel (inclusive, like `_hold_last_valid`). Recurrence
    held[y, x] = disp if valid else held[y+dy, x+dx]: a `lax.scan` over rows
    whose carry is the previous held row shifted by dx — H elementwise
    (W,)-vector steps, no gathers."""
    H, W = disp.shape
    big1 = jnp.full((1,), jnp.float32(_FBIG), disp.dtype)

    def step(carry, row):
        v, ok = row
        if dx < 0:
            shifted = jnp.concatenate([big1, carry[:-1]])
        else:
            shifted = jnp.concatenate([carry[1:], big1])
        held = jnp.where(ok, v, shifted)
        return held, held

    init = jnp.full((W,), jnp.float32(_FBIG), disp.dtype)
    _, out = jax.lax.scan(step, init, (disp, valid), reverse=(dy > 0))
    return out


def fill_hirschmuller(disp: jnp.ndarray, mismatch: jnp.ndarray) -> jnp.ndarray:
    """Full Hirschmüller 2008 §V gap filling (mirrors
    `golden.fill_hirschmuller_numpy`): collect the nearest valid disparity
    along each of the 8 directions, fill occlusions with the second-lowest
    value (lowest if only one found) and mismatches with the lower median.
    Pixels with no valid value in any direction stay invalid.

    TPU formulation: the 8 ray values come from 2 row scans
    (`associative_scan`), 2 column scans (transposed — axis-0 scans are ~7x
    slower), and 4 diagonal `lax.scan`s; selection is a length-8 sort plus
    an 8-way masked select (no gathers)."""
    valid = disp >= 0
    dT, vT = disp.T, valid.T
    vals = jnp.stack([
        _hold_last_valid(disp, valid, reverse=True),    # ray (0, +1)
        _hold_last_valid(disp, valid, reverse=False),   # ray (0, -1)
        _hold_last_valid(dT, vT, reverse=True).T,       # ray (+1, 0)
        _hold_last_valid(dT, vT, reverse=False).T,      # ray (-1, 0)
        _hold_diag(disp, valid, 1, 1),
        _hold_diag(disp, valid, 1, -1),
        _hold_diag(disp, valid, -1, 1),
        _hold_diag(disp, valid, -1, -1),
    ])                                                   # (8, H, W)
    s = jnp.sort(vals, axis=0)
    k = (vals < jnp.float32(_FBIG)).sum(axis=0)          # directions found
    idx = jnp.where(mismatch, (k - 1) // 2, jnp.minimum(1, k - 1))
    fill = s[0]
    for i in range(1, 8):
        fill = jnp.where(idx == i, s[i], fill)
    return jnp.where(valid | (k == 0), disp, fill)


# ---------------------------------------------------------------------------
# median
# ---------------------------------------------------------------------------

def median3(disp: jnp.ndarray) -> jnp.ndarray:
    """3×3 median with edge replication (mirrors golden.median3_numpy).

    Paeth's 19-exchange median-of-9 network of min/max pairs — pure
    elementwise, fuses into one pass (vs jnp.median's full sort)."""
    p = jnp.pad(disp, 1, mode="edge")
    H, W = disp.shape
    t = [p[dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)]

    def mnmx(i, j):
        t[i], t[j] = jnp.minimum(t[i], t[j]), jnp.maximum(t[i], t[j])

    for i, j in [(1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                 (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                 (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)]:
        mnmx(i, j)
    return t[4].astype(disp.dtype)
