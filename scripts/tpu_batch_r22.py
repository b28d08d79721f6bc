"""Round-2 TPU batch #22: direction-batched vertical sweeps A/B + speckle
in-context decomposition.

BATCH_DIRS (new): the K=3 vertical sweeps run their renorm tree / lane
shifts / bracket once on a (K*N, D) slab instead of K times on (N, D) —
~2.5x fewer per-row op issues at identical vector work. VMEM risk: live
temps are K-fold larger (the gate excludes adaptive-P2). This batch
verifies exactness on-chip and measures the headline both ways.

Speckle decomposition (r21: speckle = 2.78 ms/frame in-context, the
largest remaining item): time the pipeline with (a) component_big stubbed
to all-True (isolates the CC labelling), (b) labels stubbed to a constant
map (isolates the sort half). Both stubs produce wrong disparities — they
exist only to difference the timeline.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS_PATH = "scripts/tpu_r22_results.json"
REFS_DIR = "/tmp/r20_refs"
results = {}


def rec(key, value):
    results[key] = value
    print(json.dumps({key: value}), flush=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def exact(key, got, want, tol=1e-4):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    d = np.abs(got - want)
    bad = int((d > tol).sum())
    rec(key, {"max_abs": float(d.max()), "n_mismatch": bad,
              "n_px": int(got.size)})
    return bad == 0


def section(name):
    def deco(fn):
        def run(*a, **k):
            try:
                return fn(*a, **k)
            except Exception as e:  # noqa: BLE001
                rec(f"error/{name}", repr(e)[:400])
                traceback.print_exc()
                return None
        return run
    return deco


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    import tpustereo.kernels.cost_pallas as cost_pallas
    import tpustereo.kernels.sgm_pallas as sgm_pallas
    import tpustereo.ops.postproc as postproc
    cost_pallas.POPCOUNT_IMPL = "native"
    rec("device", str(jax.devices()[0].device_kind))

    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames

    kitti = PRESETS["kitti_sgm8"]
    k1 = kitti.replace(frames_per_step=1)

    # ---- 1. exactness with BATCH_DIRS (canary -> KITTI F4) -----------------
    r = np.load(f"{REFS_DIR}/small.npz")
    ok = exact("exact/small_batchdirs_vs_cpu",
               sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]), k1), r["out"])
    if not ok:
        rec("verdict", "BATCH_DIRS canary failed — flipping off")
        sgm_pallas.BATCH_DIRS = False
        jax.clear_caches()

    r4 = np.load(f"{REFS_DIR}/kitti4.npz")
    Ls = jnp.asarray(np.stack([r4[f"L{f}"] for f in range(4)]))
    Rs = jnp.asarray(np.stack([r4[f"R{f}"] for f in range(4)]))
    outs_ref = np.stack([r4[f"out{f}"] for f in range(4)])

    @section("kitti")
    def kitti_sec():
        fused = np.asarray(sgbm_frames(Ls, Rs, kitti))
        exact("exact/kitti_F4_batchdirs_vs_cpu", fused, outs_ref)
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_batchdirs",
            {k: r[k] for k in ("value", "ms_per_frame", "vs_baseline")})

    kitti_sec()

    # ---- 2. BATCH_DIRS off (r21 baseline cross-check, mostly cached) -------
    @section("batchdirs_off")
    def batchdirs_off():
        sgm_pallas.BATCH_DIRS = False
        jax.clear_caches()
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_perdir",
            {k: r[k] for k in ("value", "ms_per_frame")})
        sgm_pallas.BATCH_DIRS = True
        jax.clear_caches()

    batchdirs_off()

    # ---- 3. speckle decomposition -------------------------------------------
    @section("speckle_decomp")
    def speckle_decomp():
        real_big = postproc.component_big

        # (a) labels run, sorts stubbed: big = all True
        postproc.component_big = lambda lab, thresh, **kw: jnp.ones(
            lab.shape, bool)
        jax.clear_caches()
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_speckle_labelsonly",
            {k: r[k] for k in ("value", "ms_per_frame")})
        postproc.component_big = real_big

        # (b) labels stubbed (constant map), sorts run
        real_labels = postproc.speckle_labels
        postproc.speckle_labels = lambda disp, valid, cfg: (
            jax.lax.broadcasted_iota(jnp.int32, disp.shape, 1)
            + 0 * disp.astype(jnp.int32))
        jax.clear_caches()
        r = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_speckle_sortsonly",
            {k: r[k] for k in ("value", "ms_per_frame")})
        postproc.speckle_labels = real_labels
        jax.clear_caches()

    speckle_decomp()

    # ---- 4. mid geometries with BATCH_DIRS (4-path unaffected: K=1) --------
    @section("mid")
    def mid():
        rh = np.load(f"{REFS_DIR}/midhalf.npz")
        cfg8 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)
        exact("exact/midhalf_8path_batchdirs_vs_cpu_SKIP", True, True)
        # 8-path at mid-half exercises batched diagonals at W=1536
        out = np.asarray(sgbm(jnp.asarray(rh["L"]), jnp.asarray(rh["R"]),
                              cfg8))
        rec("ran/midhalf_8path", True)  # no CPU ref for 8-path mid-half;
        # cross-check vs BATCH_DIRS off on-chip
        sgm_pallas.BATCH_DIRS = False
        jax.clear_caches()
        out2 = np.asarray(sgbm(jnp.asarray(rh["L"]), jnp.asarray(rh["R"]),
                               cfg8))
        sgm_pallas.BATCH_DIRS = True
        jax.clear_caches()
        exact("exact/midhalf_8path_batchdirs_vs_perdir", out, out2)

    mid()

    rec("total_wall_s", round(time.time() - t_start, 1))


if __name__ == "__main__":
    sys.exit(main())
