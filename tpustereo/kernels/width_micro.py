"""Data-width micro-benchmarks for the SGM sweep inner step (VERDICT r2
missing #4 / next-round #3): measures whether 16-bit arithmetic can beat
the shipped 32-bit sweep step on this chip.

Three variants of the same per-scanline recurrence work:

* `v32`   — the shipped formulation: int32 slab, up/dn lane rolls, bracket
  mins, renorm roll-tree (`sgm_pallas._sweep_kernel`'s axial step).
* `swar`  — 2×16-bit fields packed per int32 lane (two image ROWS share a
  lane, so every lane roll moves both fields together and Mosaic's 32-bit
  roll rule is satisfied). Exact per-field min needs ~13 bit-ops (no
  packed-SIMD min exists in Mosaic): the analytic count says the packed
  step costs ~2.5x the unpacked one at half the vregs — this kernel turns
  that into an on-chip number.
* `elem16` / `elem32` — a pure elementwise min/add chain (no rolls) in
  int16 vs int32, measuring whether Mosaic runs int16 elementwise at 2x
  int32 throughput at all (the precondition for ANY future 16-bit path;
  rolls/reduces are 32-bit-only — CLAUDE.md platform rules).
* `bf16` — the round-4 candidate: the recurrence's values are all
  integers <= c_max + p2 + p1 (154 at the KITTI preset, 192 at 9x7
  census), which bf16 represents EXACTLY (integers <= 256), so the whole
  step can ride native bfloat16 — TPU-native 2-per-lane SIMD with 1-op
  mins instead of the ~12-bit-op exact SWAR min, and no packing/seam
  code at all (Mosaic owns the (8,128,2) packed layout). The open
  questions this micro answers on chip: do bf16 lane rolls legalize
  (int16 rolls did NOT, r1), at what cost, and does the end-to-end step
  beat the shipped SWAR formulation.

All integer values stay < 2^14 so both SWAR fields are borrow/sign-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The SWAR min and the 16-bit +inf live in sgm_pallas (the production
# kernel); importing them keeps this micro the on-chip exactness evidence
# for exactly the code the sweeps run — a second copy could silently
# diverge (e.g. miss a future Mosaic-workaround fix like r30's).
from tpustereo.kernels.sgm_pallas import (_BIG16, _dir_step_bf16,  # noqa: E402
                                          _swar_min)


def _min_lanes_full(x):
    for b in range(7):
        x = jnp.minimum(x, pltpu.roll(x, 1 << b, axis=x.ndim - 1))
    return x


def _sweep_step32(q, c, lane, D, p1, p2):
    up = pltpu.roll(q, D - 1, axis=1)
    up = jnp.where(lane == D - 1, _BIG16, up)
    dn = pltpu.roll(q, 1, axis=1)
    dn = jnp.where(lane == 0, _BIG16, dn)
    cand = jnp.minimum(jnp.minimum(q, jnp.minimum(up, dn) + p1), p2)
    L = c + cand
    return L - _min_lanes_full(L), L


def _sweep_step_swar(q, c, lane, D, p1, p2):
    big2 = _BIG16 * 65536 + _BIG16
    up = pltpu.roll(q, D - 1, axis=1)
    up = jnp.where(lane == D - 1, big2, up)
    dn = pltpu.roll(q, 1, axis=1)
    dn = jnp.where(lane == 0, big2, dn)
    cand = _swar_min(_swar_min(q, _swar_min(up, dn) + (p1 * 65536 + p1)),
                     jnp.full(q.shape, p2 * 65536 + p2, jnp.int32))
    L = c + cand
    M = L
    for b in range(7):
        M = _swar_min(M, pltpu.roll(M, 1 << b, axis=1))
    return L - M, L


def _kernel(c_ref, out_ref, carry_ref, *, mode, p1, p2, R):
    t = pl.program_id(0)
    N, D = carry_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, D), 1)

    @pl.when(t == 0)
    def _():
        carry_ref[...] = jnp.zeros((N, D), jnp.int32)

    step = _sweep_step_swar if mode == "swar" else _sweep_step32
    for j in range(R):
        c = c_ref[j].astype(jnp.int32)
        q, L = step(carry_ref[...], c, lane, D, p1, p2)
        carry_ref[...] = q
        out_ref[j] = L


def _kernel_i8(c_ref, out_ref, carry_ref, *, mode, p1, p2, R):
    """Production-I/O variants: int8 cost block in, int16 S block out —
    isolates the COMPUTE difference from the r29 micro's DMA asymmetry
    (its int32 input made the unpacked variant move 2x the bytes).
    swar_i8 packs the block's row HALVES in-kernel ((i, i+N/2) pairing:
    the unpack is two aligned half-slab stores, and a sublane roll of the
    packed slab is a correct roll of both fields away from the seam)."""
    t = pl.program_id(0)
    N = c_ref.shape[1]
    D = c_ref.shape[2]

    @pl.when(t == 0)
    def _():
        carry_ref[...] = jnp.zeros(carry_ref.shape, carry_ref.dtype)

    for j in range(R):
        c = c_ref[j].astype(jnp.int32)
        if mode == "bf16_i8":
            # the PRODUCTION bf16 step (one copy of the bitcast-roll trick
            # family — the r30f lesson), axial dx=0
            lane = jax.lax.broadcasted_iota(jnp.int32, (N, D), 1)
            cb = c.astype(jnp.bfloat16)  # int32 -> bf16 (values <= 24)
            q, L = _dir_step_bf16(carry_ref[...], cb, 0, None, lane,
                                  0, D, p1, p2)
            carry_ref[...] = q
            out_ref[j] = L.astype(jnp.int32).astype(jnp.int16)
        elif mode == "swar_i8":
            H = N // 2
            lane = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1)
            # shifts, not *65536: in-kernel int32 vector multiply is not
            # bit-exact (CLAUDE.md), and the production kernel packs with
            # shifts — the probe must measure the same packing
            cp = (c[:H] << 16) | c[H:]
            q, L = _sweep_step_swar(carry_ref[...], cp, lane, D, p1, p2)
            carry_ref[...] = q
            out_ref[j, :H] = (L >> 16).astype(jnp.int16)
            out_ref[j, H:] = (L & 0xFFFF).astype(jnp.int16)
        else:
            lane = jax.lax.broadcasted_iota(jnp.int32, (N, D), 1)
            q, L = _sweep_step32(carry_ref[...], c, lane, D, p1, p2)
            carry_ref[...] = q
            out_ref[j] = L.astype(jnp.int16)


def sweep_micro(C: jnp.ndarray, mode: str, p1: int = 10, p2: int = 120,
                interpret: bool = False) -> jnp.ndarray:
    """Run the axial sweep recurrence over C (T, N, D).

    mode='v32': C int32 values; mode='swar': C packed 2x16 int32 (caller
    packs two rows per lane: C_packed = C_even * 65536 + C_odd with half
    the N). Returns the per-step L volume (int32).
    mode='v32_i8'/'swar_i8'/'bf16_i8': C int8 (production cost dtype),
    S int16 out; swar packs/unpacks in-kernel (halves pairing) and bf16
    converts in-kernel, so all variants move identical HBM bytes and the
    timing difference is pure compute."""
    T, N, D = C.shape
    assert D == 128 and N % 8 == 0
    if mode == "swar_i8":
        # in-kernel halves slices/stores at sublane offset N//2 must be
        # 8-aligned, or Mosaic reads wrong data silently (CLAUDE.md);
        # mode='swar' takes pre-packed input and never slices halves
        assert N % 16 == 0, N
    if mode == "bf16_i8":
        assert N % 2 == 0, N  # the bitcast rolls pack sublane pairs
    if mode in ("v32_i8", "swar_i8", "bf16_i8"):
        kernel = functools.partial(_kernel_i8, mode=mode, p1=p1, p2=p2, R=1)
        Nc = N // 2 if mode == "swar_i8" else N
        cdt = jnp.bfloat16 if mode == "bf16_i8" else jnp.int32
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((1, N, D), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, N, D), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, N, D), jnp.int16),
            scratch_shapes=[pltpu.VMEM((Nc, D), cdt)],
            interpret=interpret,
        )(C.astype(jnp.int8))
    kernel = functools.partial(_kernel, mode=mode, p1=p1, p2=p2, R=1)
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, N, D), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, N, D), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N, D), jnp.int32),
        scratch_shapes=[pltpu.VMEM((N, D), jnp.int32)],
        interpret=interpret,
    )(C.astype(jnp.int32))


def _elem_kernel(x_ref, out_ref, *, chain, dtype):
    v = x_ref[...]
    one = jnp.ones((), dtype)
    for i in range(chain):
        v = jnp.minimum(v + one, x_ref[...] + jnp.array(i, dtype))
    out_ref[...] = v


def elem_chain_micro(x: jnp.ndarray, chain: int = 32,
                     interpret: bool = False) -> jnp.ndarray:
    """Pure elementwise add/min chain on x's dtype (int16 or int32): the
    raw dtype-throughput probe (no rolls, no reduces)."""
    N, D = x.shape
    kernel = functools.partial(_elem_kernel, chain=chain, dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((N, D), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, D), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
    )(x)


def _roll_kernel(x_ref, out_ref, *, chain, axis):
    v = x_ref[...]
    for i in range(chain):
        v = pltpu.roll(v, 1 + (i & 1), axis=axis)  # data-dependent chain
    out_ref[...] = v


def roll_chain_micro(x: jnp.ndarray, chain: int = 32,
                     interpret: bool = False, axis: int = 1) -> jnp.ndarray:
    """Dependent chain of rolls (axis=1 lanes, axis=0 sublanes) — measures
    the cross-lane op throughput that the roofline's roll-penalized
    ceiling assumes, on x's dtype (int32 shipped; bf16 probes whether
    16-bit rolls legalize at all — int16 ones did not, r1). Compare
    against `elem_chain_micro` (same shape, same chain length) to get the
    measured roll:ALU cost ratio."""
    N, D = x.shape
    kernel = functools.partial(_roll_kernel, chain=chain, axis=axis)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((N, D), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, D), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
    )(x)


def _reg_chain_kernel(x_ref, out_ref, *, chain):
    v = x_ref[...]
    one = jnp.ones((), x_ref.dtype)
    w = v + one
    for _ in range(chain):
        v = jnp.minimum(v + one, w)
        w = w + one
    out_ref[...] = v + w


def reg_chain_micro(x: jnp.ndarray, chain: int = 32,
                    interpret: bool = False) -> jnp.ndarray:
    """Register-only min/add chain (3 ops/iter, NO per-op VMEM reads) on
    x's dtype — isolates the pure ALU issue rate from load traffic: the
    r43b elem chain re-read its input every op, so its int32-vs-bf16
    ratio (4.2x) conflates ALU rate with bytes loaded. Difference two
    chain lengths (the timed-loop floor rule, CLAUDE.md)."""
    N, D = x.shape
    kernel = functools.partial(_reg_chain_kernel, chain=chain)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((N, D), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, D), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
    )(x)


def _bc_roll_kernel(x_ref, out_ref, *, chain):
    from tpustereo.kernels.sgm_pallas import _bf16_roll_lanes
    v = x_ref[...]
    for i in range(chain):
        v = _bf16_roll_lanes(v, 1 + (i & 1))
    out_ref[...] = v


def bf16_roll_chain_micro(x: jnp.ndarray, chain: int = 32,
                          interpret: bool = False) -> jnp.ndarray:
    """Dependent chain of bf16 lane rolls routed through the int32 bit
    view (native bf16 rolls fail to legalize — r43): measures the
    bitcast+roll+bitcast cost the production bf16 step pays per
    cross-lane op. x: (N, D) bfloat16, N even."""
    N, D = x.shape
    assert N % 2 == 0
    kernel = functools.partial(_bc_roll_kernel, chain=chain)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((N, D), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N, D), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
    )(x)


def pack_rows(C: jnp.ndarray) -> jnp.ndarray:
    """(T, N, D) small ints -> (T, N//2, D) packed: even rows in the high
    16-bit field, odd rows in the low field."""
    T, N, D = C.shape
    assert N % 2 == 0
    return (C[:, 0::2].astype(jnp.int32) * 65536
            + C[:, 1::2].astype(jnp.int32))


def unpack_rows(P: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_rows for non-negative <2^15 fields."""
    T, Nh, D = P.shape
    hi = P >> 16
    lo = P & 0xFFFF
    out = jnp.zeros((T, Nh * 2, D), jnp.int32)
    return out.at[:, 0::2].set(hi).at[:, 1::2].set(lo)
