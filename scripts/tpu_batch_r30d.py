"""Round-3 TPU batch #30d: isolate the size-dependent SWAR miscompile.
r30c: production-shape vertical sweep wrong (26% cells, deltas <= 231);
r30b: same code exact at (16, 64, 128). Suspects, each isolated at scale:
  1. the axial-only SWAR step (width_micro.sweep_micro) at (376,1280,128)
  2. _swar_min alone at (640, 128)
  3. the halves pack/unpack round-trip at (1280, 128)
  4. scale search over N for the axial micro
"""
import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r30d_results.json"
results = {}


def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)


def guard(name):
    def deco(fn):
        def run(*a, **k):
            try:
                return fn(*a, **k)
            except Exception as e:  # noqa: BLE001
                rec(f"error/{name}", repr(e)[:400])
                traceback.print_exc()
        return run
    return deco


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tpustereo.kernels.sgm_pallas import _swar_min
    from tpustereo.kernels.width_micro import pack_rows, sweep_micro, unpack_rows
    rec("device", str(jax.devices()[0].device_kind))
    rng = np.random.default_rng(0)

    @guard("micro_scale")
    def micro_scale():
        for N in (64, 128, 256, 512, 640, 1024, 1280):
            T = 64
            C = jnp.asarray(rng.integers(0, 25, (T, N, 128)).astype(np.int32))
            a = np.asarray(sweep_micro(C, "v32"))
            b = np.asarray(unpack_rows(sweep_micro(pack_rows(C), "swar")))
            rec(f"micro/N{N}", {"n_mismatch": int((a != b).sum()),
                                "max_abs": int(np.abs(a - b).max())})

    micro_scale()

    @guard("swar_min_alone")
    def swar_min_alone():
        H = 640
        a = rng.integers(0, 0x4200, (H, 128)).astype(np.int64)
        b = rng.integers(0, 0x4200, (H, 128)).astype(np.int64)
        pa = jnp.asarray((a[:H // 2] * 65536 + a[H // 2:]).astype(np.int32))
        pb = jnp.asarray((b[:H // 2] * 65536 + b[H // 2:]).astype(np.int32))

        def k(x_ref, y_ref, o_ref):
            o_ref[...] = _swar_min(x_ref[...], y_ref[...])

        got = np.asarray(pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec((H // 2, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((H // 2, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H // 2, 128), jnp.int32),
        )(pa, pb)).astype(np.int64)
        want_hi = np.minimum(a[:H // 2], b[:H // 2])
        want_lo = np.minimum(a[H // 2:], b[H // 2:])
        got_hi, got_lo = got >> 16, got & 0xFFFF
        rec("swar_min/H640",
            {"hi_mismatch": int((got_hi != want_hi).sum()),
             "lo_mismatch": int((got_lo != want_lo).sum())})

    swar_min_alone()

    @guard("pack_roundtrip")
    def pack_roundtrip():
        N = 1280
        c = rng.integers(0, 25, (N, 128)).astype(np.int8)

        def k(c_ref, o_ref):
            ci = c_ref[...].astype(jnp.int32)
            H = N // 2
            p = (ci[:H] << 16) | ci[H:]
            o_ref[:H] = (p >> 16).astype(jnp.int8)
            o_ref[H:] = (p & 0xFFFF).astype(jnp.int8)

        got = np.asarray(pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec((N, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int8),
        )(jnp.asarray(c)))
        rec("pack_roundtrip/N1280", {"n_mismatch": int((got != c).sum())})

    pack_roundtrip()

    rec("total_wall_s", round(time.time() - t0, 1))


if __name__ == "__main__":
    sys.exit(main())
