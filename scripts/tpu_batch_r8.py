"""Round-2 TPU batch #8: all-Pallas banded CC validation + large-geometry
re-bench.

Batch #7 attribution showed speckle = ~73 ms of the 100.9 ms single-frame
750x1500 pipeline (banded CC + the jnp scan refinement), and the banded CC
VMEM budget still OOM'd scoped VMEM by 0.5 MB in one compile context. The
rewrite (kernels/cc_pallas.py) keeps all CC rounds in VMEM via alternating
half-band-offset passes and drops the jnp refinement entirely. This batch:
on-chip exactness at KITTI (whole-image kernel rewritten: packed conn,
3-plane convergence sums) and 750x1500 (banded v2), re-bench of the large
geometries, the speckle/dr micros batch #7 left open, and the full-res
1500x3000 ladder (bare -> LR -> full) that previously never finished
compiling with the unrolled jnp refinement in the program.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r8_results.json"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.data.synthetic import synthetic_pair
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm

    kitti = PRESETS["kitti_sgm8"]
    mb = PRESETS["middlebury_sgm4"]

    def exactness(tag, cfg, shape, disparity=40.0):
        L, R, _, _ = synthetic_pair(shape, disparity=disparity, slope=0.02,
                                    seed=0)
        L, R = jnp.asarray(L), jnp.asarray(R)
        out_pal = np.asarray(sgbm(L, R, cfg))
        out_jnp = np.asarray(sgbm(L, R, cfg.replace(backend="jnp")))
        diff = np.abs(out_pal - out_jnp)
        rec(f"exact/{tag}", {
            "max_abs": float(diff.max()),
            "n_mismatch_1e5": int((diff > 1e-5).sum()),
            "n_px": int(diff.size),
        })

    # ---- 1. on-chip exactness with the rewritten CC kernel ---------------
    exactness("kitti_sgm8", kitti, (375, 1242))
    exactness("middlebury_sgm4_750x1500", mb, (750, 1500), disparity=80.0)

    # ---- 2. headline + large-geometry re-bench ---------------------------
    r = run_benchmark(kitti, shape=(375, 1242), batch=4, iters=20)
    rec("bench/kitti_sgm8_b4",
        {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})
    r = run_benchmark(mb, shape=(750, 1500), batch=2, iters=5)
    rec("bench/middlebury_half_750x1500",
        {k: r[k] for k in ("value", "ms_per_frame")})

    # ---- 3. attribution + micros at 750x1500 -----------------------------
    H, W = 750, 1500
    L8, R8, _, _ = synthetic_pair((H, W), disparity=80.0, slope=0.02, seed=0)
    L8, R8 = jnp.asarray(L8), jnp.asarray(R8)
    for name, c2 in [("full", mb),
                     ("full_nospeckle", mb.replace(speckle_window_size=0))]:
        ms = _timed_device_loop(
            lambda l, r, c2=c2: sgbm.__wrapped__(l, r, c2),
            L8, R8, iters=5) * 1e3
        rec(f"mb/{name}_ms", round(ms, 3))

    # speckle op in isolation on a realistic disparity map
    from tpustereo.ops.postproc import speckle
    disp = sgbm(L8, R8, mb.replace(speckle_window_size=0))
    valid = disp >= 0
    ms = _timed_device_loop(
        lambda d: speckle(d, valid, mb), disp, iters=5) * 1e3
    rec("micro/speckle_op_750x1500_ms", round(ms, 3))

    # dr kernel at this geometry (batch #7 attributed 24 ms to the LR
    # delta, but that delta is confounded by speckle convergence rounds)
    from tpustereo.kernels import dr_consistency_pallas
    rng = np.random.default_rng(0)
    d_r = jnp.asarray(rng.integers(0, 128, (H, W), dtype=np.int32))
    dl = jnp.asarray(rng.uniform(0, 127, (H, W)).astype(np.float32))
    ms = _timed_device_loop(
        lambda a: dr_consistency_pallas(a, dl, 128, 1), d_r, iters=10) * 1e3
    rec("micro/dr_consistency_750x1500_ms", round(ms, 3))

    # ---- 4. full-res 1500x3000 ladder ------------------------------------
    bare = mb.replace(disp12_max_diff=-1, speckle_window_size=0,
                      median_filter=False)
    r = run_benchmark(bare, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_BARE_1500x3000",
        {k: r[k] for k in ("value", "ms_per_frame")})
    lr_only = mb.replace(speckle_window_size=0, median_filter=False)
    r = run_benchmark(lr_only, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_LR_1500x3000",
        {k: r[k] for k in ("value", "ms_per_frame")})
    # full-res exactness of the NEW component only (banded CC) vs the native
    # union-find on a realistic full-res disparity — the jnp pipeline twin at
    # this size is a known compile bomb (unrolled scan CC never finished)
    Lf, Rf, _, _ = synthetic_pair((1500, 3000), disparity=120.0, slope=0.02,
                                  seed=0)
    Lf, Rf = jnp.asarray(Lf), jnp.asarray(Rf)
    df = np.asarray(sgbm(Lf, Rf, lr_only))
    vf = df >= 0
    rngf = np.float32(mb.speckle_range)
    ch = vf[:, :-1] & vf[:, 1:] & (np.abs(df[:, :-1] - df[:, 1:]) <= rngf)
    cv = vf[:-1, :] & vf[1:, :] & (np.abs(df[:-1, :] - df[1:, :]) <= rngf)
    from tpustereo import native
    from tpustereo.kernels import connected_component_labels_pallas
    lab_ref = native.cc_labels(ch, cv)
    lab_tpu = np.asarray(connected_component_labels_pallas(
        jnp.asarray(ch), jnp.asarray(cv)))
    rec("exact/cc_banded_1500x3000",
        {"n_mismatch": int((lab_ref != lab_tpu).sum()),
         "n_px": int(lab_ref.size)})
    r = run_benchmark(mb, shape=(1500, 3000), batch=1, iters=3)
    rec("bench/middlebury_full_1500x3000",
        {k: r[k] for k in ("value", "ms_per_frame")})

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
