"""In-VMEM bitonic sort as a Pallas TPU kernel.

Why: `jax.lax.sort` on TPU costs ~2.4-2.7 ms for a 465K int32 sequence and
is FLAT across shapes (measured, scripts/tpu_r16_results.json) — and the
speckle filter's `component_big` needs two full-image sorts per frame,
making lax.sort over half the post-processing budget at KITTI size. A
bitonic network is oblivious (189 compare-exchange passes for 2^19
elements, each a pair of rolls + selects on the whole slab), which is
exactly the shape of op the VPU streams at full rate.

Layout: the flat array (padded to a power of two) is viewed as
(rows, 128) int32 with flat index i = row*128 + lane. The XOR-pairing
form of the network keeps every exchange at a constant distance
2^j: partners are lane-rolls for j < 7 and sublane-rolls for j >= 7, with
the low/high side and ascending/descending run selected by single bits of
the (row, lane) iotas — no gathers, no data-dependent control flow.

Pair mode (keys + payload) uses a tie-safe pair-swap: with duplicate keys
a naive "take partner if comparison matches my side" duplicates one
payload and drops the other; computing the pair's swap decision from
(low-side value, high-side value) on both sides keeps the exchange a
permutation. Payload order within equal keys is arbitrary (bitonic is not
stable) — `component_big` only needs grouping, so that is fine.

Bit-exact vs jnp baselines: sorted keys equal `jnp.sort`; pair mode's
payload is SOME valid permutation (tests check sortedness + multiset +
per-key payload-set equality).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_IMAX = (1 << 31) - 1

# VMEM ceiling: in/out blocks (and their doubles) for keys [+ payload]
# must fit ~16 MB scoped VMEM. 2^19 x int32 = 2 MB per slab; pair mode
# carries four slabs plus streaming temps.
MAX_LOG2_PAIR = 19
MAX_LOG2_KEYS = 20


def _roll(x, shift: int, axis: int):
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _partner(x, j: int, low):
    """Value at flat index (i ^ 2^j) for every element."""
    if j < 7:
        m = 1 << j
        return jnp.where(low, _roll(x, -m, 1), _roll(x, m, 1))
    mr = 1 << (j - 7)
    return jnp.where(low, _roll(x, -mr, 0), _roll(x, mr, 0))


def _kernel(k_ref, *rest, n_log2, has_p):
    p_ref = rest[0] if has_p else None
    ko_ref = rest[1 if has_p else 0]
    po_ref = rest[2] if has_p else None

    v = k_ref[...]
    p = p_ref[...] if has_p else None
    rows, L = v.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 0)

    for k in range(1, n_log2 + 1):
        asc = ((lane >> k) & 1) == 0 if k < 7 else ((row >> (k - 7)) & 1) == 0
        for j in range(k - 1, -1, -1):
            low = (((lane >> j) & 1) == 0 if j < 7
                   else ((row >> (j - 7)) & 1) == 0)
            pv = _partner(v, j, low)
            # select/== with BOOLEAN branches lowers to an i8->i1 trunci
            # Mosaic rejects ("Unsupported target bitwidth for truncation",
            # found on-chip r17) — express everything as i1 logical ops
            if has_p:
                pp = _partner(p, j, low)
                lv = jnp.where(low, v, pv)
                hv = jnp.where(low, pv, v)
                swap = (asc & (hv < lv)) | (~asc & (lv < hv))
                v = jnp.where(swap, pv, v)
                p = jnp.where(swap, pp, p)
            else:
                # == over i1 via xor: (pv<v) == (asc == low)
                take = (pv < v) ^ asc ^ low
                v = jnp.where(take, pv, v)

    ko_ref[...] = v
    if has_p:
        po_ref[...] = p


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
