"""Round-4 TPU batch #42: re-gate after the D=512 pack-shift
generalization (a32aeb8 touched the production WTA packing: S*256 ->
S<<ps), then gate the new D=512/384 surface on chip and record their
throughput. Runs bench.py's own 3-run headline at the end so the judged
entry point's number is captured from HEAD.
"""
import json, os, subprocess, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r42_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

REFS = "/tmp/r42_refs"

def ensure_refs():
    os.makedirs(REFS, exist_ok=True)
    for case in ("d512",):
        path = f"{REFS}/{case}.npz"
        if not os.path.exists(path):
            t = time.time()
            subprocess.run([sys.executable, "scripts/cpu_refs_helper.py",
                            path, case], check=True)
            rec(f"refs/{case}_s", round(time.time() - t, 1))

def gate(name, ref_npz, cfg, sgbm, jnp, tol=1e-4):
    r = np.load(ref_npz)
    got = np.asarray(sgbm(jnp.asarray(r["L"]), jnp.asarray(r["R"]),
                          cfg)).astype(np.float64)
    d = np.abs(got - r["out"])
    rec(f"exact/{name}", {"max_abs": float(d.max()),
                          "n_mismatch": int((d > tol).sum()),
                          "n_px": int(d.size)})

def main():
    t0 = time.time()
    ensure_refs()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark
    from tpustereo.pipeline.sgbm import sgbm
    rec("device", str(jax.devices()[0].device_kind))
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)

    # 1. post-pack-shift canaries at the production packing (ps = 8)
    try:
        gate("head_canary_small", "/tmp/r29_refs/small.npz", k1, sgbm, jnp)
    except Exception as e:
        rec("error/canary", repr(e)[:500]); traceback.print_exc()
    try:
        r = np.load("/tmp/r29_refs/kitti4.npz")
        got = np.asarray(sgbm(jnp.asarray(r["L0"]), jnp.asarray(r["R0"]),
                              k1)).astype(np.float64)
        d = np.abs(got - r["out0"])
        rec("exact/kitti_f0", {"max_abs": float(d.max()),
                               "n_mismatch": int((d > 1e-4).sum())})
    except Exception as e:
        rec("error/kitti_f0", repr(e)[:500]); traceback.print_exc()
    try:
        gate("d256_375x1242", "/tmp/r40_refs/d256.npz",
             k1.replace(num_disparities=256), sgbm, jnp)
        gate("mindisp_375x1242", "/tmp/r40_refs/mindisp.npz",
             k1.replace(min_disparity=16), sgbm, jnp)
    except Exception as e:
        rec("error/d256_regate", repr(e)[:500]); traceback.print_exc()

    # 2. new D=512 surface: exactness + throughput (256x960 geometry —
    # content past d=256 so the upper lane blocks decide real pixels)
    try:
        gate("d512_256x960", f"{REFS}/d512.npz",
             k1.replace(num_disparities=512), sgbm, jnp)
        r = run_benchmark(k1.replace(num_disparities=512, batch_size=8),
                          shape=(256, 960), batch=8, iters=20)
        rec("bench/d512_256x960_f1", {k: r[k] for k in ("value",
                                                        "ms_per_frame")})
    except Exception as e:
        rec("error/d512", repr(e)[:500]); traceback.print_exc()

    # 3. headline sanity at HEAD (pack shift must be perf-neutral), via
    # the judged entry point itself (3 runs, mean + spread)
    try:
        p = subprocess.run([sys.executable, "bench.py"], check=True,
                           capture_output=True, text=True, timeout=3600)
        line = p.stdout.strip().splitlines()[-1]
        rec("bench/bench_py_head", json.loads(line))
    except Exception as e:
        rec("error/benchpy", repr(e)[:500]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - t0, 1))

if __name__ == "__main__":
    sys.exit(main())
