"""In-VMEM block-bitonic sort as Pallas TPU kernels.

Why: `jax.lax.sort` on TPU costs ~2.4-2.7 ms for a 465K int32 sequence and
is FLAT across shapes (measured, scripts/tpu_r16_results.json) — and the
speckle filter's `component_big` needs two full-image sorts per frame,
making lax.sort over half the post-processing budget at KITTI size. A
bitonic network is oblivious (each compare-exchange pass is a pair of
rolls + selects on a whole slab), which is exactly the shape of op the
VPU streams at full rate.

Layout: the flat array (padded to a power of two) is viewed as
(parts, rows, 128) int32 with flat index i = (part*rows + row)*128 + lane.
The XOR-pairing form of the network keeps every exchange at a constant
distance 2^j: partners are lane-rolls for j < 7 and sublane-rolls for
7 <= j < part_log2, with the low/high side and ascending/descending run
read off single bits of the lane/row iotas — no gathers, no
data-dependent control flow.

VMEM discipline (hard-won, r17/r19 on-chip): a whole-array kernel at 2^19
needs in+out blocks + loop carries + exchange temps on 2 MB slabs and
measured 16.02-17.58 MB scoped VMEM — over the 16 MB budget. The network
therefore runs BLOCKED at 2^17 elements per part (0.5 MB slabs):

  1. one grid-over-parts kernel bitonic-sorts each part locally, with the
     final stage's direction = bit0 of the part id (in the global XOR
     network only the LAST stage's asc bit of the local prefix is a
     part-id bit — the data is bitonic before it regardless);
  2. every global stage k > part_log2 runs its cross-part substages
     (j >= part_log2) as elementwise tie-safe min/max between part pairs
     at the jnp level (XLA ops, ~4 MB HBM traffic each — negligible), and
     its within-part tail (j < part_log2, direction = one part-id bit) in
     a second grid-over-parts kernel. The tail kernel is ONE program
     reused across stages: the direction is (program_id >> shift) & 1
     with `shift` an SMEM scalar input.

Compile-time discipline (hard-won): a fully unrolled network (190
substages of slab ops at 2^19) took the remote Mosaic compiler >20 min
for ONE program — the IR explodes. Both kernels run their substages as
`lax.fori_loop`s with DYNAMIC `pltpu.roll` shifts (verified legal + exact
on-chip) and a two-branch `lax.cond` picking the lane vs sublane axis;
sort state lives in the OUTPUT refs so the loop carries are scalars
(loop-carried slabs measured +2 MB scoped VMEM, r19). (`lax.switch` over
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
per-key payload pairing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_IMAX = (1 << 31) - 1
_PART_LOG2 = 17  # 2^17 x int32 = 0.5 MB per part slab

# Practical caps (KITTI frame = 465750 -> 2^19; Middlebury full-res 4.5M
# falls back to lax.sort). Work grows ~n log^2 n; nothing larger is
# exercised, so stay conservative.
MAX_LOG2_PAIR = 21
MAX_LOG2_KEYS = 21


def _kernel(shift_ref, *rest, n_local, full_sort, has_p):
    """Grid step = one part. full_sort: local bitonic stages 1..n_local
    with the final stage's direction = (program_id >> shift) & 1. Tail
    mode: substages n_local-1..0 of one global stage, direction likewise.
    State lives in the output refs (ko/po); loop carries are scalars."""
    k_ref = rest[0]
    p_ref = rest[1] if has_p else None
    ko_ref = rest[2 if has_p else 1]
    po_ref = rest[3] if has_p else None

    rows, L = k_ref.shape[-2:]
    pid = pl.program_id(0)
    dir_bit = jax.lax.shift_right_logical(pid, shift_ref[0]) & 1  # 0 = asc

    def local_bit(b):
        """Bit b of the local index row*128 + lane, read from the iotas —
        never a materialised flat-index slab (VMEM)."""
        def lane_bit():
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
            return jax.lax.shift_right_logical(lane, b) & 1

        def row_bit():
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 0)
            return jax.lax.shift_right_logical(row, b - 7) & 1

        return jax.lax.cond(b < 7, lane_bit, row_bit)

    def partners(j, low, xs):
        """Value at local index (i ^ 2^j) for each slab in xs. Dynamic
        pltpu.roll (verified legal + exact on-chip): roll(x, sz-m)[i] =
        x[i+m] is the low side's partner, roll(x, m)[i] = x[i-m] the high
        side's. lax.cond picks the lane (j < 7) vs sublane axis."""

        def lane_axis(ops):
            m = jax.lax.shift_left(jnp.int32(1), j)
            return tuple(jnp.where(low, pltpu.roll(x, L - m, axis=1),
                                   pltpu.roll(x, m, axis=1)) for x in ops)

        def row_axis(ops):
            m = jax.lax.shift_left(jnp.int32(1), j - 7)
            return tuple(jnp.where(low, pltpu.roll(x, rows - m, axis=0),
                                   pltpu.roll(x, m, axis=0)) for x in ops)

        return jax.lax.cond(j < 7, lane_axis, row_axis, xs)

    def substage(j, asc):
        low = local_bit(j) == 0
        if has_p:
            v, p = ko_ref[0], po_ref[0]
            pv, pp = partners(j, low, (v, p))
            lv = jnp.where(low, v, pv)
            hv = jnp.where(low, pv, v)
            swap = (asc & (hv < lv)) | (~asc & (lv < hv))
            ko_ref[0] = jnp.where(swap, pv, v)
            po_ref[0] = jnp.where(swap, pp, p)
        else:
            v = ko_ref[0]
            (pv,) = partners(j, low, (v,))
            # == over i1 via xor: take partner iff (pv<v) == (asc == low)
            take = (pv < v) ^ asc ^ low
            ko_ref[0] = jnp.where(take, pv, v)

    ko_ref[0] = k_ref[0]
    if has_p:
        po_ref[0] = p_ref[0]

    if full_sort:
        def stage(k, _):
            # asc bit: local index bit k for the inner stages; the final
            # stage's direction is the part-id bit (the data is bitonic
            # before it either way, so only the last stage sets the order)
            ascb = jax.lax.cond(
                k < n_local, lambda: local_bit(k),
                lambda: jnp.broadcast_to(dir_bit, (rows, L)))
            asc = ascb == 0

            def sub(i, c):
                substage(k - 1 - i, asc)
                return c

            return jax.lax.fori_loop(0, k, sub, _)

        jax.lax.fori_loop(1, n_local + 1, stage, jnp.int32(0))
    else:
        asc = dir_bit == 0

        def sub(i, c):
            substage(n_local - 1 - i, asc)
            return c

        jax.lax.fori_loop(0, n_local, sub, jnp.int32(0))


def bitonic_feasible(n: int, has_payload: bool) -> bool:
    np2 = max(256, 1 << (n - 1).bit_length())
    return np2.bit_length() - 1 <= (MAX_LOG2_PAIR if has_payload
                                    else MAX_LOG2_KEYS)


def _part_call(ops, full_sort: bool, n_local: int, shift: int,
               interpret: bool):
    Q, rows, L = ops[0].shape
    spec = pl.BlockSpec((1, rows, L), lambda q: (q, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, n_local=n_local, full_sort=full_sort,
                          has_p=len(ops) == 2),
        grid=(Q,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * len(ops),
        out_specs=[spec] * len(ops),
        out_shape=[jax.ShapeDtypeStruct((Q, rows, L), jnp.int32)
                   for _ in ops],
        interpret=interpret,
    )(jnp.array([shift], jnp.int32), *ops)


def _cross_exchange(ops, j_part: int, asc_bit: int, q_total: int):
    """One cross-part substage at part-distance 2^j_part, tie-safe, as
    plain elementwise XLA ops. asc = bit `asc_bit` of the part id == 0."""
    m = 1 << j_part
    outer = q_total // (2 * m)
    shaped = [x.reshape(outer, 2, m, *x.shape[1:]) for x in ops]
    a = jnp.arange(outer, dtype=jnp.int32)
    asc = ((a >> (asc_bit - j_part - 1)) & 1) == 0
    asc = asc[:, None, None, None]
    ka, kb = shaped[0][:, 0], shaped[0][:, 1]
    swap = jnp.where(asc, kb < ka, ka < kb)
    out = []
    for x in shaped:
        xa, xb = x[:, 0], x[:, 1]
        na = jnp.where(swap, xb, xa)
        nb = jnp.where(swap, xa, xb)
        out.append(jnp.stack([na, nb], axis=1).reshape(q_total,
                                                       *x.shape[3:]))
    return out


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
    p_log2 = min(n_log2, _PART_LOG2)
    Q = np2 >> p_log2
    rows = (1 << p_log2) // _LANES

    ops = [jnp.pad(keys, (0, np2 - n), constant_values=_IMAX).reshape(
        Q, rows, _LANES)]
    if payload is not None:
        ops.append(jnp.pad(payload, (0, np2 - n)).reshape(Q, rows, _LANES))

    # 1. local sorts; part direction = bit0 of the part id (= global index
    # bit p_log2, the last local stage's asc bit)
    ops = list(_part_call(ops, True, p_log2, 0, interpret))

    # 2. global stages: cross-part substages at the jnp level, then the
    # within-part tail in the (single, reused) tail kernel
    for kg in range(p_log2 + 1, n_log2 + 1):
        for j in range(kg - 1, p_log2 - 1, -1):
            ops = _cross_exchange(ops, j - p_log2, kg - p_log2, Q)
        ops = list(_part_call(ops, False, p_log2, kg - p_log2, interpret))

    if payload is None:
        return ops[0].reshape(-1)[:n]
    return ops[0].reshape(-1)[:n], ops[1].reshape(-1)[:n]
