"""Round-5 TPU batch #48 (batch B — the new fused SAD kernel + the
adaptive-P2 F-stacked path, on chip).

1. Exactness gates vs CPU refs (interpret cannot catch Mosaic bugs):
   - tsukuba preset through the fused plane-sweep SAD kernel
   - tsukuba + LR check + min_disparity=8 (incremental right-WTA carry)
   - tsukuba + block 11 + D=128 (field-packing edges)
   - kitti adaptive-P2 x F=4 stacked vs 4 CPU singles (r5 gate lift)
2. fps: tsukuba batch-marginal (B=8 vs 24 differenced) at F in {1, 4, 8}
   (the fused kernel makes F segments of one launch; pick the preset F).
3. Adaptive-P2 fattening A/B: kitti8 adaptive F=4 vs F=1 (the ~1.1
   ms/frame VERDICT r4 next #2 cites for the non-adaptive case).
4. Headline canary.

Refs must exist (run scripts/run_r48.sh): /tmp/r48_refs/{tsukuba,
tsukuba_lr,tsukuba_b11,kitti4_ap2}.npz
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r48_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v, "t": round(time.time() - T0, 1)}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

T0 = time.time()
REFS = "/tmp/r48_refs"


def compare(name, got, want):
    got, want = np.asarray(got), np.asarray(want)
    vg, vw = got >= 0, want >= 0
    mism = int((vg != vw).sum())
    both = vg & vw
    maxab = float(np.abs(got - want)[both].max()) if both.any() else 0.0
    int_mism = int((np.floor(got[both] * 16) != np.floor(want[both] * 16)).sum())
    rec(f"{name}/valid_mismatches", mism)
    rec(f"{name}/float_max_abs", round(maxab, 9))
    rec(f"{name}/sub16_mismatches", int_mism)
    rec(f"{name}/exact", bool(mism == 0 and maxab <= 2e-5 and int_mism == 0))


def main():
    import tpustereo
    tpustereo.enable_compilation_cache()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import _timed_device_loop, run_benchmark
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames, sgbm_batched
    rec("device", str(jax.devices()[0].device_kind))
    cfg1 = PRESETS["tsukuba_sad"]

    # 1) exactness gates -------------------------------------------------
    for name, cfg in (("tsukuba", cfg1),
                      ("tsukuba_lr", cfg1.replace(disp12_max_diff=1,
                                                  min_disparity=8)),
                      ("tsukuba_b11", cfg1.replace(sad_block=11,
                                                   num_disparities=128))):
        try:
            d = np.load(f"{REFS}/{name}.npz")
            out = sgbm(jnp.asarray(d["L"]), jnp.asarray(d["R"]), cfg)
            compare(f"exact/{name}", out, d["out"])
        except Exception as e:
            rec(f"error/{name}", repr(e)[:400]); traceback.print_exc()

    try:
        d = np.load(f"{REFS}/kitti4_ap2.npz")
        cfg = PRESETS["kitti_sgm8"].replace(adaptive_p2=True)
        Ls = jnp.asarray(np.stack([d[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([d[f"R{f}"] for f in range(4)]))
        out = np.asarray(sgbm_frames(Ls, Rs, cfg))
        want = np.stack([d[f"out{f}"] for f in range(4)])
        compare("exact/kitti4_ap2_F4", out, want)
    except Exception as e:
        rec("error/kitti4_ap2", repr(e)[:400]); traceback.print_exc()

    # 2) tsukuba fps through the fused kernel ----------------------------
    from tpustereo.data.synthetic import synthetic_pair
    L, R, _, _ = synthetic_pair((288, 384), disparity=20.0, slope=0.05,
                                seed=0)
    for F in (1, 4, 8):
        try:
            cfg = cfg1.replace(frames_per_step=F)
            ts = {}
            for B in (8, 24):
                lefts = jnp.asarray(np.stack([L] * B))
                rights = jnp.asarray(np.stack([R] * B))
                ts[B] = _timed_device_loop(
                    lambda l, r, c=cfg: sgbm_batched(l, r, c),
                    lefts, rights, iters=20)
            marg = (ts[24] - ts[8]) / 16
            rec(f"sadfused/F{F}_ms_per_frame_marginal", round(marg * 1e3, 4))
            rec(f"sadfused/F{F}_fps_marginal", round(1.0 / marg, 1))
        except Exception as e:
            rec(f"error/sadF{F}", repr(e)[:400]); traceback.print_exc()

    # 3) adaptive-P2 F A/B at KITTI --------------------------------------
    try:
        cfg = PRESETS["kitti_sgm8"].replace(adaptive_p2=True)
        r = run_benchmark(cfg, shape=(375, 1242), batch=16, iters=20)
        rec("ap2/F4_fps", r["value"])
        r = run_benchmark(cfg.replace(frames_per_step=1), shape=(375, 1242),
                          batch=16, iters=20)
        rec("ap2/F1_fps", r["value"])
    except Exception as e:
        rec("error/ap2", repr(e)[:400]); traceback.print_exc()

    # 4) canary ----------------------------------------------------------
    try:
        r = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242),
                          batch=16, iters=20)
        rec("canary/kitti8_fps", r["value"])
    except Exception as e:
        rec("error/canary", repr(e)[:400])

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
