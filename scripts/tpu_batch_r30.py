"""Round-3 TPU batch #30: SWAR sweeps in production — on-chip exactness
gates (interpret mode cannot catch Mosaic bugs) + headline A/B.

SWEEP_SWAR=True is the candidate default (r29c micro: 0.933x at
production I/O). Gates: kitti_sgm8 F=4 vs CPU refs; middlebury_sgm4
(4-path) small vs CPU; then the b16 headline both ways.
"""
import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RESULTS = "scripts/tpu_r30_results.json"
REFS = "/tmp/r29_refs"
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


def ensure_refs(case):
    os.makedirs(REFS, exist_ok=True)
    path = f"{REFS}/{case}.npz"
    if not os.path.exists(path):
        subprocess.run([sys.executable, "scripts/cpu_refs_helper.py", path,
                        case], check=True, timeout=1800)
    return np.load(path)


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    import tpustereo.kernels.sgm_pallas as sgm_pallas
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))
    rec("SWEEP_SWAR", sgm_pallas.SWEEP_SWAR)
    kitti = PRESETS["kitti_sgm8"]

    refs = ensure_refs("kitti4")
    Ls = jnp.asarray(np.stack([refs[f"L{f}"] for f in range(4)]))
    Rs = jnp.asarray(np.stack([refs[f"R{f}"] for f in range(4)]))
    outs_ref = np.stack([refs[f"out{f}"] for f in range(4)])

    @section("exact_kitti")
    def exact_kitti():
        got = np.asarray(sgbm_frames(Ls, Rs, kitti)).astype(np.float64)
        d = np.abs(got - outs_ref)
        rec("exact/kitti_F4_swar_vs_cpu",
            {"max_abs": float(d.max()), "n_mismatch": int((d > 1e-4).sum()),
             "n_px": int(got.size)})

    exact_kitti()

    @section("exact_small")
    def exact_small():
        # single-frame kitti path (F=1: horizontal sweeps fall back to v32
        # by the N%16 gate, vertical sweeps run SWAR) + the 4-path preset
        r = ensure_refs("small")
        got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                              PRESETS["kitti_sgm8"].replace(
                                  frames_per_step=1))).astype(np.float64)
        d = np.abs(got - r["out"])
        rec("exact/small_F1_swar_vs_cpu",
            {"max_abs": float(d.max()), "n_mismatch": int((d > 1e-4).sum())})

    exact_small()

    @section("ab_headline")
    def ab_headline():
        r_on = run_benchmark(kitti, shape=(375, 1242), batch=16, iters=20)
        rec("bench/kitti_F4_b16_SWAR_on",
            {k: r_on[k] for k in ("value", "ms_per_frame", "vs_baseline")})
        sgm_pallas.SWEEP_SWAR = False
        jax.clear_caches()
        try:
            r_off = run_benchmark(kitti, shape=(375, 1242), batch=16,
                                  iters=20)
            rec("bench/kitti_F4_b16_SWAR_off",
                {k: r_off[k] for k in ("value", "ms_per_frame")})
        finally:
            sgm_pallas.SWEEP_SWAR = True
            jax.clear_caches()

    ab_headline()

    @section("sgm4_bench")
    def sgm4_bench():
        cfg = PRESETS["middlebury_sgm4"].replace(frames_per_step=4)
        r = run_benchmark(cfg, shape=(375, 1242), batch=8, iters=20)
        rec("bench/middlebury_sgm4_F4_b8_SWAR_on",
            {k: r[k] for k in ("value", "ms_per_frame")})

    sgm4_bench()

    rec("total_wall_s", round(time.time() - t0, 1))


if __name__ == "__main__":
    sys.exit(main())
