"""Data-width micro-kernel exactness (interpret mode; VERDICT r2 #3). The
on-chip timings these kernels exist for are recorded in BASELINE.md."""

import numpy as np
import jax
import jax.numpy as jnp

from tpustereo.kernels.width_micro import (_swar_min, elem_chain_micro,
                                           pack_rows, sweep_micro,
                                           unpack_rows)


def test_swar_min_exact_per_field(rng):
    a = jnp.asarray(rng.integers(0, 0x4200, (256,), dtype=np.int64).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 0x4200, (256,), dtype=np.int64).astype(np.int32))
    pa = a[0::2] * 65536 + a[1::2]
    pb = b[0::2] * 65536 + b[1::2]
    got = np.asarray(jax.jit(_swar_min)(pa, pb))
    assert ((got >> 16) == np.minimum(np.asarray(a[0::2]), np.asarray(b[0::2]))).all()
    assert ((got & 0xFFFF) == np.minimum(np.asarray(a[1::2]), np.asarray(b[1::2]))).all()


def test_swar_sweep_matches_v32(rng):
    C = rng.integers(0, 25, (12, 16, 128)).astype(np.int32)
    L32 = np.asarray(sweep_micro(jnp.asarray(C), "v32", interpret=True))
    P = pack_rows(jnp.asarray(C))
    Ls = np.asarray(unpack_rows(sweep_micro(P, "swar", interpret=True)))
    assert (L32 == Ls).all()


def test_bf16_sweep_matches_v32(rng):
    """The bf16 step is exact while all values are integers <= 256:
    renormalized carries <= c_max+p2, candidates <= c_max+p2+p1 (154 at
    the KITTI penalties, 192 at 9x7 census — both probed)."""
    for c_max in (25, 63):
        C = jnp.asarray(rng.integers(0, c_max, (12, 16, 128)).astype(np.int8))
        a = np.asarray(sweep_micro(C, "v32_i8", interpret=True))
        b = np.asarray(sweep_micro(C, "bf16_i8", interpret=True))
        assert (a == b).all()


def test_roll_chain_is_pure_permutation(rng):
    from tpustereo.kernels.width_micro import roll_chain_micro
    x = jnp.asarray(rng.integers(0, 1000, (8, 128)).astype(np.int32))
    out = np.asarray(roll_chain_micro(x, chain=4, interpret=True))
    # chain of rolls by 1,2,1,2 = net roll by 6
    want = np.roll(np.asarray(x), 6, axis=1)
    assert (out == want).all()


def test_elem_chain_dtype_parity(rng):
    x16 = jnp.asarray(rng.integers(0, 100, (64, 128)).astype(np.int16))
    o16 = np.asarray(elem_chain_micro(x16, interpret=True))
    o32 = np.asarray(elem_chain_micro(x16.astype(jnp.int32), interpret=True))
    assert (o16.astype(np.int32) == o32).all()
