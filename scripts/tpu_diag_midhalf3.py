"""Diag round 3: the per-stage outputs are exact, so the mismatch must be
in (a) the valid/uniqueness map (not compared in round 2), or (b) the
pipeline-shaped composition (one fused jit program, Ct passed from the
cost kernel) vs the stage-isolated jits."""

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "scripts/tpu_diag_midhalf3.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def rowstats(key, bad_per_row):
    b = np.asarray(bad_per_row)
    nz = np.nonzero(b)[0]
    rec(key, {"n_mismatch": int(b.sum()),
              "first_bad_row": int(nz[0]) if nz.size else None,
              "last_bad_row": int(nz[-1]) if nz.size else None,
              "n_bad_rows": int(nz.size)})


def main():
    import jax
    import jax.numpy as jnp
    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    from tpustereo.config import PRESETS
    from tpustereo.kernels import (census_cost_volume_pallas,
                                   sgm_select_pallas)

    cfg = PRESETS["middlebury_sgm4"]
    refs = np.load("/tmp/midhalf_refs.npz")
    H, W, D = refs["C"].shape
    Hp, Wq = (H + 7) // 8 * 8, (W + 127) // 128 * 128
    L = jnp.asarray(refs["L"])
    R = jnp.asarray(refs["Rimg"])
    C_ref = jax.device_put(jnp.asarray(refs["C"]))
    disp_ref = jax.device_put(jnp.asarray(refs["disp"]))
    valid_ref = jax.device_put(jnp.asarray(refs["valid"]))

    def pad_ref(c):
        full = jnp.full((Hp, Wq, D), cfg.max_census_cost, jnp.uint8)
        full = full.at[:H, :W, :].set(c)
        return full.at[H:, :, :].set(0)

    try:
        # round-2 select program (cached) — now compare VALID too
        d_pal, v_pal, _ = jax.jit(lambda c: sgm_select_pallas(
            c, cfg, L, dims=(H, W, D)))(pad_ref(C_ref))
        rowstats("select_valid_vs_ref_perrow",
                 jax.jit(lambda a, b: (a != b).sum(axis=1))(v_pal, valid_ref))
        rowstats("select_masked_disp_perrow", jax.jit(
            lambda d, v, dr, vr: (jnp.abs(jnp.where(v, d, -1.0)
                                          - jnp.where(vr, dr, -1.0))
                                  > 1e-5).sum(axis=1))(
            d_pal, v_pal, disp_ref, valid_ref))
    except Exception as e:  # noqa: BLE001
        rec("error/valid", repr(e)[:300])
        traceback.print_exc()

    try:
        # pipeline-shaped: cost kernel + select in ONE jit, Ct passed fused
        def fused(l, r):
            C, Ct = census_cost_volume_pallas(
                l, r, D, cfg.max_census_cost, cfg.census_window,
                padded=True, with_transposed=True)
            return sgm_select_pallas(C, cfg, l, dims=(H, W, D), Ct=Ct)

        d_f, v_f, _ = jax.jit(fused)(L, R)
        rowstats("fused_disp_vs_ref_perrow", jax.jit(
            lambda a, b: (jnp.abs(a - b) > 1e-5).sum(axis=1))(d_f, disp_ref))
        rowstats("fused_valid_vs_ref_perrow", jax.jit(
            lambda a, b: (a != b).sum(axis=1))(v_f, valid_ref))
    except Exception as e:  # noqa: BLE001
        rec("error/fused", repr(e)[:300])
        traceback.print_exc()

    try:
        # same composition but Ct via the standalone transpose kernel
        def fused_not(l, r):
            C = census_cost_volume_pallas(
                l, r, D, cfg.max_census_cost, cfg.census_window, padded=True)
            return sgm_select_pallas(C, cfg, l, dims=(H, W, D))

        d_n, v_n, _ = jax.jit(fused_not)(L, R)
        rowstats("fusednoct_disp_vs_ref_perrow", jax.jit(
            lambda a, b: (jnp.abs(a - b) > 1e-5).sum(axis=1))(d_n, disp_ref))
        rowstats("fusednoct_valid_vs_ref_perrow", jax.jit(
            lambda a, b: (a != b).sum(axis=1))(v_n, valid_ref))
    except Exception as e:  # noqa: BLE001
        rec("error/fusednoct", repr(e)[:300])
        traceback.print_exc()

    rec("done", True)


if __name__ == "__main__":
    sys.exit(main())
