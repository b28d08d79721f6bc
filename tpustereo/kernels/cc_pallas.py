"""Connected-component labelling as in-VMEM Pallas kernels (SURVEY.md §3
#8, §7 hard parts — the one irregular algorithm).

The XLA fallback (`ops.postproc.connected_component_labels`) iterates four
segmented `associative_scan`s per round with HBM round-trips at every scan
level (~10 ms at KITTI size for ~6 rounds; ~70 ms at true Middlebury size).
Here the label image lives in VMEM and each round runs four Hillis-Steele
segmented min-scans as lane/sublane masked rolls — no HBM traffic between
rounds.

Images that fit scoped VMEM (~16 MB) run as ONE whole-image kernel.
Oversized images (true Middlebury half/full-res) run BANDED: row bands
converge independently in VMEM with the cross-band conn_v edge masked, and
an outer `lax.while_loop` alternates two band phases offset by half a band
— every cross-band edge of phase A lies strictly inside a phase-B band, so
min labels hop at least half a band per pass and the alternation converges
to the exact global fixpoint (min-label propagation is monotone, and the
union of the two phases' edges is the full edge set). This keeps ALL the
O(rounds) work in VMEM — the earlier jnp-scan refinement this replaces was
~70 ms of a 100 ms Middlebury frame.

Convergence without an `old` snapshot inside the kernel (VMEM is the scarce
resource): labels only ever decrease, so tracking the byte-plane sums
(Σ(lab>>16), Σ((lab>>8)&255), Σ(lab&255)) detects change exactly — lab>>16
is per-element monotone, so an unchanged top-plane sum freezes every top
plane, which makes the next plane per-element monotone in turn; and each
plane sum is ≤ N·255 < 2³¹ even at full-res label magnitudes (a single
Σ(lab>>8) overflowed int32 there).

Bit-exact vs the XLA fallback and the native C++ union-find
(`native.cc_labels`): identical min-linear-index labels after the stride
conversion in the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1 << 24


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _seg_scan(v, conn, idx, axis: int, size: int, reverse: bool):
    """Segmented min-scan along `axis` via masked-roll Hillis-Steele.
    conn[.., i] connects element i to i+1 along the axis."""
    levels = max(1, (size - 1).bit_length())
    if not reverse:
        sc = pltpu.roll(conn, 1, axis=axis)
        f = jnp.where(idx == 0, 1, 1 - sc)
    else:
        f = 1 - conn
    for k in range(levels):
        s = 1 << k
        if not reverse:
            sv = pltpu.roll(v, s, axis=axis)
            sf = pltpu.roll(f, s, axis=axis)
            edge = idx < s
        else:
            sv = pltpu.roll(v, size - s, axis=axis)
            sf = pltpu.roll(f, size - s, axis=axis)
            edge = idx >= size - s
        sv = jnp.where(edge, _BIG, sv)
        sf = jnp.where(edge, 1, sf)
        v = jnp.where(f == 1, v, jnp.minimum(v, sv))
        f = f | sf
    return v


def _cc_kernel(conn_ref, *rest, H: int, W: int, max_iters: int,
               banded: bool = False, has_init: bool = False):
    """conn packs both edge masks per pixel: bit 0 = right edge (conn_h),
    bit 1 = down edge (conn_v) — one input buffer instead of two (VMEM
    block buffers are the banded-height bottleneck)."""
    init_ref = rest[0] if has_init else None
    lab_ref = rest[-1]
    conn = conn_ref[...]
    ch = conn & 1
    cv = conn >> 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    if banded:
        # per-band pass: the band's last conn_v row (the edge to the next
        # band) is masked off — cross-band merges happen in the alternating
        # offset passes of the wrapper's outer loop
        cv = jnp.where(row == H - 1, 0, cv)
    if has_init:
        lab0 = init_ref[...]
    else:
        lab0 = row * W + lane

    def cond(c):
        _, _, _, _, i, changed = c
        return changed & (i < max_iters)

    def body(c):
        lab, s2, s1, s0, i, _ = c
        lab = _seg_scan(lab, ch, lane, axis=1, size=W, reverse=False)
        lab = _seg_scan(lab, ch, lane, axis=1, size=W, reverse=True)
        lab = _seg_scan(lab, cv, row, axis=0, size=H, reverse=False)
        lab = _seg_scan(lab, cv, row, axis=0, size=H, reverse=True)
        n2 = jnp.sum(lab >> 16)
        n1 = jnp.sum((lab >> 8) & 255)
        n0 = jnp.sum(lab & 255)
        return (lab, n2, n1, n0, i + 1,
                (n2 != s2) | (n1 != s1) | (n0 != s0))

    lab, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (lab0, jnp.int32(-1), jnp.int32(-1), jnp.int32(-1),
                     jnp.int32(0), True))
    lab_ref[...] = lab


def cc_pallas_fits(H: int, W: int) -> bool:
    """Whether the whole-image kernel fits scoped VMEM (~16 MB): it holds
    the packed conn, the label image and the scan temporaries as (Hp, Wq)
    int32 — ~4 live slabs. At KITTI size that is ~6 MB; true Middlebury
    (750x1500 up) does not fit and runs banded."""
    Hp = _round_up(H, 8)
    Wq = _round_up(W, 128)
    return Hp * Wq * 4 * 4 <= 14 * 2 ** 20


def _banded_pass(lab, conn, Hb: int, interpret: bool):
    """One converge-every-band pass: (Hp, Wq) labels + packed conn ->
    labels, bands of Hb rows each run to their own fixpoint in VMEM."""
    Hp, Wq = lab.shape
    kernel = functools.partial(_cc_kernel, H=Hb, W=Wq, max_iters=Hb * Wq,
                               banded=True, has_init=True)
    spec = pl.BlockSpec((Hb, Wq), lambda b: (b, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(Hp // Hb,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wq), jnp.int32),
        interpret=interpret,
    )(conn, lab)


def connected_component_labels_pallas(conn_h: jnp.ndarray,
                                      conn_v: jnp.ndarray,
                                      interpret: bool = False,
                                      band_rows: int | None = None) -> jnp.ndarray:
    """Drop-in for `ops.postproc.connected_component_labels`:
    conn_h (H, W-1), conn_v (H-1, W) bool -> (H, W) int32 min-linear-index
    labels (stride W).

    Oversized images (cc_pallas_fits False) run the alternating banded
    scheme described in the module docstring — exact, entirely in Pallas.
    """
    H = conn_v.shape[0] + 1
    W = conn_h.shape[1] + 1
    Hp = _round_up(H, 8)
    Wq = _round_up(W, 128)

    if band_rows is not None:  # testing override
        Hb, banded = band_rows, True
        Hp = _round_up(Hp, Hb)
    elif cc_pallas_fits(H, W):
        Hb, banded = Hp, False
    else:
        # largest 8-multiple band height within scoped VMEM: with a grid,
        # Pallas double-buffers the conn/label-in/label-out blocks on top
        # of ~5 live in-kernel slabs (lab + decoded conn + scan temps) —
        # measured ~50 bytes/element for the 2-input layout at Wq=1536;
        # budget 12 MB / 56 B per element for headroom (the 40 B estimate
        # OOM'd scoped VMEM by 0.5 MB at Wq=1536)
        Hb = max(8, (12 * 2 ** 20 // (56 * Wq)) // 8 * 8)
        Hp = _round_up(Hp, Hb)
        banded = True

    conn = (jnp.zeros((Hp, Wq), jnp.int32)
            .at[:H, :W - 1].add(conn_h.astype(jnp.int32))
            .at[:H - 1, :W].add(2 * conn_v.astype(jnp.int32)))

    if not banded:
        kernel = functools.partial(_cc_kernel, H=Hp, W=Wq,
                                   max_iters=Hp * Wq)
        spec = pl.BlockSpec((Hp, Wq), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
        lab = pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((Hp, Wq), jnp.int32),
            interpret=interpret,
        )(conn)[:H, :W]
        return (lab // Wq) * W + (lab % Wq)

    # banded: alternate band phases offset by half a band until a full
    # cycle changes nothing. `anchor` keeps the while_loop carry varying
    # under shard_map (same trick as the jnp fallback).
    # any 0 < O < Hb works (phase-B boundaries must fall strictly inside
    # phase-A bands); half a band maximises the per-pass propagation hop
    O = max(1, Hb // 2)
    connB = jnp.pad(conn, ((O, Hb - O), (0, 0)))
    row0 = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wq), 0)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wq), 1)
    anchor = conn.max() * 0
    lab0 = row0 * Wq + lane0 + anchor

    def cond(c):
        _, changed, i = c
        return changed & (i < Hp * Wq)

    def body(c):
        lab, _, i = c
        new = _banded_pass(lab, conn, Hb, interpret)
        new = _banded_pass(
            jnp.pad(new, ((O, Hb - O), (0, 0)), constant_values=_BIG),
            connB, Hb, interpret)[O:O + Hp]
        return new, jnp.any(new != lab), i + 1

    lab, _, _ = jax.lax.while_loop(cond, body, (lab0, anchor == 0, anchor))
    lab = lab[:H, :W]
    # stride conversion Wq -> W (same argmin pixel: lexicographic order)
    return (lab // Wq) * W + (lab % Wq)
