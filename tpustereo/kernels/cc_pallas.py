"""Connected-component labelling as a single whole-image in-VMEM Pallas
kernel (SURVEY.md §3 #8, §7 hard parts — the one irregular algorithm).

The XLA fallback (`ops.postproc.connected_component_labels`) iterates four
segmented `associative_scan`s per round with HBM round-trips at every scan
level (~10 ms at KITTI size for ~6 rounds). Here the whole (384, 1280)
int32 label image lives in VMEM and each round runs four Hillis-Steele
segmented min-scans as lane/sublane masked rolls — no HBM traffic at all
between rounds.

Convergence without an `old` snapshot (VMEM is the scarce resource): min
label propagation is monotone non-increasing, so Σlab strictly decreases on
any change; tracking (Σ(lab>>8), Σ(lab&255)) — both int32-safe — detects
convergence exactly.

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


def _cc_kernel(ch_ref, cv_ref, lab_ref, *, H: int, W: int, max_iters: int,
               banded: bool = False):
    ch = ch_ref[...]
    cv = cv_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    if banded:
        # per-band pass of the banded mode: labels are GLOBAL linear
        # indices, and the band's last conn_v row (the edge to the next
        # band) is masked off — cross-band merges happen in the jnp
        # refinement (ops.postproc.connected_component_labels init_labels)
        row = row + pl.program_id(0) * H
        cv = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
                       == H - 1, 0, cv)
    lab0 = row * W + lane

    def cond(c):
        _, _, _, i, changed = c
        return changed & (i < max_iters)

    def body(c):
        lab, sh, sl, i, _ = c
        lab = _seg_scan(lab, ch, lane, axis=1, size=W, reverse=False)
        lab = _seg_scan(lab, ch, lane, axis=1, size=W, reverse=True)
        lab = _seg_scan(lab, cv, row, axis=0, size=H, reverse=False)
        lab = _seg_scan(lab, cv, row, axis=0, size=H, reverse=True)
        nh = jnp.sum(lab >> 8)
        nl = jnp.sum(lab & 255)
        return lab, nh, nl, i + 1, (nh != sh) | (nl != sl)

    lab, _, _, _, _ = jax.lax.while_loop(
        cond, body, (lab0, jnp.int32(-1), jnp.int32(-1), jnp.int32(0),
                     True))
    lab_ref[...] = lab


def cc_pallas_fits(H: int, W: int) -> bool:
    """Whether the whole-image kernel fits scoped VMEM (~16 MB): it holds
    ch, cv, lab and the label image as (Hp, Wq) int32 — ~4 live slabs. At
    KITTI size that is ~6 MB; true Middlebury full-res (~1500x3000) does
    not fit and must use the jnp fallback."""
    Hp = _round_up(H, 8)
    Wq = _round_up(W, 128)
    return Hp * Wq * 4 * 4 <= 14 * 2 ** 20


def connected_component_labels_pallas(conn_h: jnp.ndarray,
                                      conn_v: jnp.ndarray,
                                      interpret: bool = False,
                                      band_rows: int | None = None) -> jnp.ndarray:
    """Drop-in for `ops.postproc.connected_component_labels`:
    conn_h (H, W-1), conn_v (H-1, W) bool -> (H, W) int32 min-linear-index
    labels (stride W).

    Images too large for one in-VMEM pass (cc_pallas_fits False, e.g. true
    Middlebury geometry) run BANDED: each row band converges independently
    in VMEM with global linear-index labels and cross-band conn_v masked,
    then the jnp scan refinement finishes from that init — exact, because
    min-propagation converges to the per-component min of the initial
    labels, and each band-component's min is already a member of the global
    component (see ops.postproc.connected_component_labels). The expensive
    O(rounds) work happens in VMEM; the refinement typically needs only the
    few cross-band merge rounds.
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
        # largest 8-multiple band height that fits scoped VMEM: with a grid,
        # Pallas double-buffers the two inputs and the output (6 block
        # buffers) on top of ~4 live in-kernel slabs (lab + scan temps) —
        # ~40 bytes per element, not 16 (measured: the 16x estimate OOM'd
        # at 25.2 MB for 592-row bands at Wq=1536)
        Hb = max(8, (13 * 2 ** 20 // (40 * Wq)) // 8 * 8)
        Hp = _round_up(Hp, Hb)
        banded = True

    ch = jnp.zeros((Hp, Wq), jnp.int32).at[:H, :W - 1].set(
        conn_h.astype(jnp.int32))
    cv = jnp.zeros((Hp, Wq), jnp.int32).at[:H - 1, :W].set(
        conn_v.astype(jnp.int32))

    # Hb*Wq is the provably safe iteration bound (see the jnp fallback);
    # the in-kernel convergence check exits typical images in <10 rounds.
    kernel = functools.partial(_cc_kernel, H=Hb, W=Wq,
                               max_iters=Hb * Wq, banded=banded)
    spec = pl.BlockSpec((Hb, Wq), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    lab = pl.pallas_call(
        kernel,
        grid=(Hp // Hb,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Hp, Wq), jnp.int32),
        interpret=interpret,
    )(ch, cv)[:H, :W]
    # stride conversion Wq -> W (same argmin pixel: lexicographic order)
    lab = (lab // Wq) * W + (lab % Wq)
    if banded:
        from tpustereo.ops.postproc import connected_component_labels
        lab = connected_component_labels(conn_h, conn_v, init_labels=lab)
    return lab
