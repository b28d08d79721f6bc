"""Diagnose the middlebury_half pallas-vs-jnp mismatch (r19).

Both full-pipeline programs are compile-cached from the r19 run, so the
first two steps are cheap. Then isolate: EMIT off (new compile), postproc
off (new compiles), stage diffs. Results + diff maps saved incrementally.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = "scripts/tpu_diag_midhalf"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(OUT + ".json", "w") as f:
        json.dump(results, f, indent=1)


def stats(key, a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.abs(a - b)
    bad = d > 1e-5
    rows = bad.any(axis=1)
    cols = bad.any(axis=0)
    rec(key, {
        "n_mismatch": int(bad.sum()), "n_px": int(bad.size),
        "max_abs": float(d.max()),
        "bad_row_span": [int(np.argmax(rows)),
                         int(len(rows) - np.argmax(rows[::-1]) - 1)]
        if rows.any() else None,
        "bad_col_span": [int(np.argmax(cols)),
                         int(len(cols) - np.argmax(cols[::-1]) - 1)]
        if cols.any() else None,
        "frac_bad_by_row_quarter": [round(float(bad[i * len(rows) // 4:
                                                    (i + 1) * len(rows) // 4]
                                                .mean()), 4)
                                    for i in range(4)],
        "frac_bad_by_col_quarter": [round(float(bad[:, i * len(cols) // 4:
                                                    (i + 1) * len(cols) // 4]
                                                .mean()), 4)
                                    for i in range(4)],
    })
    return bad


def main():
    import jax
    import jax.numpy as jnp
    import tpustereo.kernels.cost_pallas as cost_pallas
    import tpustereo.kernels.sgm_pallas as sgm_pallas
    cost_pallas.POPCOUNT_IMPL = "native"
    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.pipeline.sgbm import sgbm

    cfg_h = PRESETS["middlebury_sgm4"]
    Lh, Rh, _, _ = synthetic_pair((750, 1500), disparity=60.0, slope=0.03,
                                  seed=9)
    Lh, Rh = jnp.asarray(Lh), jnp.asarray(Rh)

    pal = np.asarray(sgbm(Lh, Rh, cfg_h))
    ref = np.asarray(sgbm(Lh, Rh, cfg_h.replace(backend="jnp")))
    bad = stats("full_pallas_vs_jnp", pal, ref)
    np.savez_compressed(OUT + ".npz", pal=pal, ref=ref)

    # no-postproc variants: isolates sgm_select vs postproc kernels
    strip = dict(speckle_window_size=0, median_filter=False,
                 disp12_max_diff=-1)
    cfg_s = cfg_h.replace(**strip)
    pal_s = np.asarray(sgbm(Lh, Rh, cfg_s))
    ref_s = np.asarray(sgbm(Lh, Rh, cfg_s.replace(backend="jnp")))
    stats("nopost_pallas_vs_jnp", pal_s, ref_s)
    np.savez_compressed(OUT + "_nopost.npz", pal=pal_s, ref=ref_s)

    # emission A/B on the no-postproc pipeline (cheapest program to flip)
    sgm_pallas.EMIT_TRANSPOSED = False
    jax.clear_caches()
    pal_ext = np.asarray(sgbm(Lh, Rh, cfg_s))
    stats("nopost_EMIToff_vs_jnp", pal_ext, ref_s)
    stats("nopost_EMITon_vs_off", pal_s, pal_ext)
    sgm_pallas.EMIT_TRANSPOSED = True
    jax.clear_caches()

    # full-pipeline emission A/B
    sgm_pallas.EMIT_TRANSPOSED = False
    jax.clear_caches()
    pal_ext_full = np.asarray(sgbm(Lh, Rh, cfg_h))
    stats("full_EMIToff_vs_jnp", pal_ext_full, ref)
    sgm_pallas.EMIT_TRANSPOSED = True
    jax.clear_caches()

    rec("done", True)


if __name__ == "__main__":
    sys.exit(main())
