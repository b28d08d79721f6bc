"""Round-4 TPU batch #41:
1. Clean third headline run (r40's run0 was polluted by a concurrent
   CPU-refs regen that briefly touched the chip) + `--stages` refresh so
   the record carries the new SWAR-true roofline accounting.
2. D=256 with F=2 frame stacking (bwd VMEM gate admits F=2 at D=256:
   62*752*256 = 11.9 MB) — exactness gate + bench.
3. Device-side tiled odometry record (config-5 two-dispatch composition,
   strips=1 on this chip; VERDICT r3 weak #6).
4. Speckle closure micro (VERDICT r3 next #3): the delta between the
   pair sort (label+idx payload) and a payload-free single-int32 sort at
   the production 1.86M size bounds what ANY payload-elimination
   formulation could save — every structural alternative is already
   ledgered dead (bitonic r20, batched-axis r23, scatter r3).
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r41_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

def main():
    t0 = time.time()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import (run_benchmark, run_odometry_benchmark,
                                      _timed_device_loop)
    from tpustereo.pipeline.sgbm import sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    cfg4 = PRESETS["kitti_sgm8"]

    # 1. clean headline run + stages (the stages record now carries both
    # roofline accountings)
    try:
        r = run_benchmark(cfg4, shape=(375, 1242), batch=16, iters=20,
                          stages=True)
        rec("bench/headline_run3_clean", {k: r[k] for k in
                                          ("value", "ms_per_frame")})
        rec("stages/head", r["stage_ms"])
        rec("roofline/head", {k: r["roofline"][k] for k in
                              ("frame", "core", "frame_swar_true",
                               "core_swar_true", "hbm_util", "bound")})
    except Exception as e:
        rec("error/headline3", repr(e)[:500]); traceback.print_exc()

    # 2. D=256 F=2: exactness (stacked frames vs the single-pair CPU ref
    # duplicated) then throughput
    try:
        ref = np.load("/tmp/r40_refs/d256.npz")
        cfg256 = cfg4.replace(num_disparities=256, frames_per_step=2)
        Ls = jnp.asarray(np.stack([ref["L"], ref["L"]]))
        Rs = jnp.asarray(np.stack([ref["R"], ref["R"]]))
        got = np.asarray(sgbm_frames(Ls, Rs, cfg256)).astype(np.float64)
        d = np.abs(got - ref["out"][None])
        rec("exact/d256_f2", {"max_abs": float(d.max()),
                              "n_mismatch": int((d > 1e-4).sum())})
        r = run_benchmark(cfg256, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_d256_f2", {k: r[k] for k in ("value",
                                                      "ms_per_frame")})
    except Exception as e:
        rec("error/d256_f2", repr(e)[:500]); traceback.print_exc()

    # 3. tiled odometry device record (strips=1 composition on this chip)
    try:
        r = run_odometry_benchmark(PRESETS["kitti_odometry"],
                                   shape=(375, 1242), frames=4, iters=10,
                                   tiled=True)
        rec("odometry/tiled_device", {k: r[k] for k in
                                      ("value", "ms_per_frame", "metric")})
    except Exception as e:
        rec("error/odo_tiled", repr(e)[:500]); traceback.print_exc()

    # 4. speckle sort-cost bound: pair sort vs payload-free sort at the
    # production flat size (4 KITTI frames = 1.863M)
    try:
        n = 4 * 375 * 1242
        rng = np.random.default_rng(0)
        keys = jnp.asarray(rng.integers(0, n, n, dtype=np.int32))
        idx = jnp.arange(n, dtype=jnp.int32)

        def pair(k, i):
            sl, si = jax.lax.sort((k, i), num_keys=1, is_stable=False)
            return sl.astype(jnp.float32).sum() + si[0]

        def single(k, i):
            return jax.lax.sort(k, is_stable=False).astype(
                jnp.float32).sum() + i[0]

        sp = _timed_device_loop(pair, keys, idx, iters=20)
        ss = _timed_device_loop(single, keys, idx, iters=20)
        rec("speckle/sort_bound_ms", {
            "pair_1p86M_ms": round(sp * 1e3, 3),
            "single_1p86M_ms": round(ss * 1e3, 3),
            "payload_elimination_bound_ms_per_4frames":
                round((sp - ss) * 1e3, 3)})
    except Exception as e:
        rec("error/sortbound", repr(e)[:500]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
