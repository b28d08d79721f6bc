"""Round-3 TPU batch #29c: (a) HONEST odometry numbers — r29's 2.0 ms was
DCE'd (the pose doesn't depend on the frame's own disparity; the checksum
fix forces every TrackOut field) — sequential fused step AND the F=4
stacked-tracking chunk; (b) production-I/O SWAR micro (int8 in, int16 out,
identical HBM bytes both variants) to decide whether r29's 0.831x was
compute or DMA."""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r29c_results.json"
results = {}


def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)


def section(name):
    def deco(fn):
        def run(*a, **k):
            t0 = time.time()
            try:
                out = fn(*a, **k)
                rec(f"wall_s/{name}", round(time.time() - t0, 1))
                return out
            except Exception as e:  # noqa: BLE001
                rec(f"error/{name}", repr(e)[:400])
                traceback.print_exc()
                return None
        return run
    return deco


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import _timed_device_loop, run_odometry_benchmark
    rec("device", str(jax.devices()[0].device_kind))
    odo_cfg = PRESETS["kitti_odometry"].replace(strips=1)

    @section("odometry_sequential")
    def odometry_sequential():
        r = run_odometry_benchmark(odo_cfg, shape=(375, 1242), frames=4,
                                   iters=10, stacked=False)
        rec("odometry/fused_step_honest",
            {k: r[k] for k in ("value", "ms_per_frame", "max_corners")})

    odometry_sequential()

    @section("odometry_stacked")
    def odometry_stacked():
        r = run_odometry_benchmark(odo_cfg.replace(frames_per_step=4),
                                   shape=(375, 1242), frames=4, iters=10,
                                   stacked=True)
        rec("odometry/fused_chunk_F4",
            {k: r[k] for k in ("value", "ms_per_frame", "max_corners")})

    odometry_stacked()

    @section("width_i8")
    def width_i8():
        from tpustereo.kernels.width_micro import sweep_micro
        rng = np.random.default_rng(0)
        T, N, D = 376, 1280, 128
        C = jnp.asarray(rng.integers(0, 25, (T, N, D)).astype(np.int8))
        small = C[:8, :64]
        a = np.asarray(sweep_micro(small, "v32_i8"))
        b = np.asarray(sweep_micro(small, "swar_i8"))
        rec("width/i8_exact_on_chip", {"n_mismatch": int((a != b).sum())})
        s32 = _timed_device_loop(lambda c: sweep_micro(c, "v32_i8"), C,
                                 iters=10)
        ssw = _timed_device_loop(lambda c: sweep_micro(c, "swar_i8"), C,
                                 iters=10)
        rec("width/i8_sweep_step_us",
            {"v32_i8": round(s32 / T * 1e6, 3),
             "swar_i8": round(ssw / T * 1e6, 3),
             "swar_vs_v32": round(ssw / s32, 3)})

    width_i8()

    rec("total_wall_s", round(time.time() - t0, 1))


if __name__ == "__main__":
    sys.exit(main())
