"""In-VMEM bitonic sort as a Pallas TPU kernel.

Why: `jax.lax.sort` on TPU costs ~2.4-2.7 ms for a 465K int32 sequence and
is FLAT across shapes (measured, scripts/tpu_r16_results.json) — and the
speckle filter's `component_big` needs two full-image sorts per frame,
making lax.sort over half the post-processing budget at KITTI size. A
bitonic network is oblivious (190 compare-exchange passes for 2^19
elements, each a pair of rolls + selects on the whole slab), which is
exactly the shape of op the VPU streams at full rate.

Layout: the flat array (padded to a power of two) is viewed as
(rows, 128) int32 with flat index i = row*128 + lane. The XOR-pairing
form of the network keeps every exchange at a constant distance 2^j:
partners are lane-rolls for j < 7 and sublane-rolls for j >= 7, with the
low/high side and ascending/descending run read off single bits of the
flat-index iota — no gathers, no data-dependent control flow.

Compile-time discipline (hard-won): a fully unrolled network (190
substages of slab ops) took the remote Mosaic compiler >20 min for ONE
program at 2^19 — the IR explodes. The kernel therefore runs the network
as nested `lax.fori_loop`s with DYNAMIC `pltpu.roll` shifts (verified
legal + exact on-chip), a two-branch `lax.cond` picking the lane vs
sublane axis, and the side/direction bits read from the lane/row iotas
with dynamic shifts (never a materialised flat-index slab — VMEM) — the
whole program is ~one substage of IR regardless of n. (`lax.switch` over
static roll branches does NOT work: it lowers to arith.select of vectors
on a scalar i1, which Mosaic rejects.)

Pair mode (keys + payload) uses a tie-safe pair-swap: with duplicate keys
a naive "take partner if comparison matches my side" duplicates one
payload and drops the other; computing the pair's swap decision from
(low-side value, high-side value) on both sides keeps the exchange a
permutation. Payload order within equal keys is arbitrary (bitonic is not
stable) — `component_big` only needs grouping, so that is fine.
Boolean-select note: select/== with i1-valued BRANCHES lowers to an
i8->i1 trunci Mosaic rejects (found on-chip r17) — everything boolean
here is expressed as i1 logical ops.

Bit-exact vs jnp baselines: sorted keys equal `jnp.sort`; pair mode's
payload is SOME valid permutation (tests check sortedness + multiset +
per-key payload-set pairing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_IMAX = (1 << 31) - 1

# VMEM ceiling: in/out blocks for keys [+ payload] plus the loop-carried
# slabs must fit ~16 MB scoped VMEM. 2^19 x int32 = 2 MB per slab; pair
# mode carries four slabs plus streaming temps.
MAX_LOG2_PAIR = 19
MAX_LOG2_KEYS = 20


def _kernel(k_ref, *rest, n_log2, has_p):
    p_ref = rest[0] if has_p else None
    ko_ref = rest[1 if has_p else 0]
    po_ref = rest[2] if has_p else None

    v0 = k_ref[...]
    rows, L = v0.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 0)

    def idx_bit(b):
        """Bit b of the flat index row*128 + lane, WITHOUT materialising
        the flat-index slab (it cost 2 MB of Mosaic stack — the pair-mode
        kernel at 2^19 measured 16.02 MB scoped VMEM, 24 KB over budget,
        with it). lane holds bits 0-6, row the rest."""
        return jax.lax.cond(b < 7, lambda: (lane >> b) & 1,
                            lambda: (row >> (b - 7)) & 1)

    def partners(j, low, xs):
        """Value at flat index (i ^ 2^j) for each slab in xs. Dynamic
        pltpu.roll (verified legal + exact on-chip): roll(x, sz-m)[i] =
        x[i+m] is the low side's partner, roll(x, m)[i] = x[i-m] the high
        side's. lax.cond picks the lane (j < 7) vs sublane axis — a
        lax.switch here lowered to arith.select of vectors on a scalar i1,
        which Mosaic rejects."""

        def lane_axis(ops):
            m = 1 << j
            return tuple(jnp.where(low, pltpu.roll(x, L - m, axis=1),
                                   pltpu.roll(x, m, axis=1)) for x in ops)

        def row_axis(ops):
            m = 1 << (j - 7)
            return tuple(jnp.where(low, pltpu.roll(x, rows - m, axis=0),
                                   pltpu.roll(x, m, axis=0)) for x in ops)

        return jax.lax.cond(j < 7, lane_axis, row_axis, xs)

    def substage(i, carry):
        k, ascb, vp = carry
        j = k - 1 - i
        low = idx_bit(j) == 0
        asc = ascb == 0
        if has_p:
            v, p = vp
            pv, pp = partners(j, low, (v, p))
            lv = jnp.where(low, v, pv)
            hv = jnp.where(low, pv, v)
            swap = (asc & (hv < lv)) | (~asc & (lv < hv))
            vp = (jnp.where(swap, pv, v), jnp.where(swap, pp, p))
        else:
            (pv,) = partners(j, low, (vp,))
            # == over i1 via xor: take partner iff (pv<v) == (asc == low)
            take = (pv < vp) ^ asc ^ low
            vp = jnp.where(take, pv, vp)
        return (k, ascb, vp)

    def stage(k, vp):
        # the ascending/descending mask depends only on the stage, so its
        # bit slab rides the substage carry (an i32 slab — i1 loop
        # carries are a Mosaic legalisation risk)
        _, _, vp = jax.lax.fori_loop(0, k, substage, (k, idx_bit(k), vp))
        return vp

    if has_p:
        v, p = jax.lax.fori_loop(1, n_log2 + 1, stage, (v0, p_ref[...]))
        ko_ref[...] = v
        po_ref[...] = p
    else:
        ko_ref[...] = jax.lax.fori_loop(1, n_log2 + 1, stage, v0)


def bitonic_feasible(n: int, has_payload: bool) -> bool:
    np2 = max(256, 1 << (n - 1).bit_length())
    return np2.bit_length() - 1 <= (MAX_LOG2_PAIR if has_payload
                                    else MAX_LOG2_KEYS)


def bitonic_sort_pallas(keys: jnp.ndarray, payload: jnp.ndarray | None = None,
                        interpret: bool = False):
    """Sort a flat int32 array ascending (with an optional int32 payload
    permuted alongside). Callers must check `bitonic_feasible(n, payload
    is not None)` — oversized inputs belong to lax.sort. Keys must be
    < 2^31 - 1 (the pad sentinel)."""
    (n,) = keys.shape
    np2 = max(256, 1 << (n - 1).bit_length())
    assert bitonic_feasible(n, payload is not None), n
    n_log2 = np2.bit_length() - 1
    rows = np2 // _LANES

    kp = jnp.pad(keys, (0, np2 - n), constant_values=_IMAX).reshape(
        rows, _LANES)
    operands = [kp]
    if payload is not None:
        operands.append(jnp.pad(payload, (0, np2 - n)).reshape(rows, _LANES))

    spec = pl.BlockSpec((rows, _LANES), lambda: (0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((rows, _LANES), jnp.int32)]
    if payload is not None:
        out_shape.append(jax.ShapeDtypeStruct((rows, _LANES), jnp.int32))

    res = pl.pallas_call(
        functools.partial(_kernel, n_log2=n_log2, has_p=payload is not None),
        grid=(),
        in_specs=[spec] * len(operands),
        out_specs=[spec] * len(out_shape),
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if payload is None:
        return res[0].reshape(-1)[:n]
    return res[0].reshape(-1)[:n], res[1].reshape(-1)[:n]
