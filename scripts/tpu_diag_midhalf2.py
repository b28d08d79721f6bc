"""Stage isolation for the 750x1500 rows>=376 mismatch (r19 diag round 2).

CPU-computed stage references (/tmp/midhalf_refs.npz) are device_put once;
every comparison reduces ON DEVICE to per-row mismatch counts, so nothing
volume-sized crosses the tunnel and no jnp reference needs an hour-long
TPU compile.
"""

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "scripts/tpu_diag_midhalf2.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def rowstats(key, bad_per_row):
    b = np.asarray(bad_per_row)
    nz = np.nonzero(b)[0]
    rec(key, {
        "n_mismatch": int(b.sum()),
        "first_bad_row": int(nz[0]) if nz.size else None,
        "last_bad_row": int(nz[-1]) if nz.size else None,
        "n_bad_rows": int(nz.size),
        "counts_head": b[max(0, nz[0] - 2):nz[0] + 6].tolist()
        if nz.size else [],
    })


def main():
    import jax
    import jax.numpy as jnp
    import tpustereo.kernels.cost_pallas as cost_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    from tpustereo.config import PRESETS
    from tpustereo.kernels import (aggregate_pallas,
                                   census_cost_volume_pallas,
                                   sgm_select_pallas, wta_lr_pallas)

    cfg = PRESETS["middlebury_sgm4"]
    refs = np.load("/tmp/midhalf_refs.npz")
    H, W, D = refs["C"].shape
    Hp, Wq = (H + 7) // 8 * 8, (W + 127) // 128 * 128
    L = jnp.asarray(refs["L"])
    R = jnp.asarray(refs["Rimg"])
    C_ref = jax.device_put(jnp.asarray(refs["C"]))
    S_ref = jax.device_put(jnp.asarray(refs["S"]))
    disp_ref = jax.device_put(jnp.asarray(refs["disp"]))
    rec("shapes", [int(H), int(W), int(D), int(Hp), int(Wq)])

    # padded reference volume with the cost kernel's padding semantics:
    # padded cols (x >= W) = max_cost everywhere, padded rows = 0
    def pad_ref(c):
        full = jnp.full((Hp, Wq, D), cfg.max_census_cost, jnp.uint8)
        full = full.at[:H, :W, :].set(c)
        return full.at[H:, :, :].set(0)

    try:
        # ---- stage 1: cost kernel (padded + fused Ct) ----
        C_pal, Ct_pal = jax.jit(lambda l, r: census_cost_volume_pallas(
            l, r, D, cfg.max_census_cost, cfg.census_window,
            padded=True, with_transposed=True))(L, R)
        Cp_ref = jax.jit(pad_ref)(C_ref)
        bad = jax.jit(lambda a, b: (a != b).sum(axis=(1, 2)))(C_pal, Cp_ref)
        rowstats("cost_C_vs_ref_perrow", bad)
        # Ct (Wq, Hp, D) consistency vs transpose of the kernel's own C
        badt = jax.jit(lambda t, c: (
            t.reshape(Wq, Hp, D) != jnp.swapaxes(c, 0, 1)
        ).sum(axis=(0, 2)))(Ct_pal, C_pal)
        rowstats("costCt_vs_C_perrow(img rows)", badt)
    except Exception as e:  # noqa: BLE001
        rec("error/cost", repr(e)[:300])
        traceback.print_exc()

    try:
        # ---- stage 2: 4 sweeps (aggregate) on the REFERENCE volume ----
        S_pal = jax.jit(lambda c: aggregate_pallas(c, cfg, L))(C_ref)
        bad = jax.jit(lambda a, b: (
            a.astype(jnp.int32) != b.astype(jnp.int32)).sum(axis=(1, 2)))(
            S_pal, S_ref)
        rowstats("aggregate_vs_ref_perrow", bad)
    except Exception as e:  # noqa: BLE001
        rec("error/aggregate", repr(e)[:300])
        traceback.print_exc()

    try:
        # ---- stage 3: select (sweeps + WTA fused) on the padded ref ----
        d_pal, v_pal, _ = jax.jit(lambda c: sgm_select_pallas(
            c, cfg, L, dims=(H, W, D)))(pad_ref(C_ref))
        bad = jax.jit(lambda a, b: (jnp.abs(a - b) > 1e-5).sum(axis=1))(
            d_pal, disp_ref)
        rowstats("select_disp_vs_ref_perrow", bad)
    except Exception as e:  # noqa: BLE001
        rec("error/select", repr(e)[:300])
        traceback.print_exc()

    try:
        # ---- stage 4: WTA alone on the REFERENCE S (census_wta kernel) ----
        d_w, v_w = jax.jit(lambda s: wta_lr_pallas(s, cfg))(S_ref)
        bad = jax.jit(lambda a, b: (jnp.abs(a - b) > 1e-5).sum(axis=1))(
            d_w, disp_ref)
        rowstats("wta_on_refS_vs_ref_perrow", bad)
    except Exception as e:  # noqa: BLE001
        rec("error/wta", repr(e)[:300])
        traceback.print_exc()

    rec("done", True)


if __name__ == "__main__":
    sys.exit(main())
