"""Round-5 TPU batch #49: adaptive-P2 operating point — attribution and
the f32-division p2_map.

1. Final 3-run headline at HEAD (the judged convention, warms the
   driver's cache).
2. Adaptive kitti8 F=4 at HEAD (p2_map quotient now rides f32 division —
   exhaustively proven == integer division over the gated domain) vs the
   r48 int-div reading (56.07 fps).
3. Adaptive F=4 --stages decomposition (production differencing): where
   do the ~5.4 ms between adaptive (56 fps) and the 79.9 headline sit —
   p2-map construction, the v32 bwd recurrence, or map traffic?
4. Adaptive exactness re-gate after the p2_map change (refs unchanged:
   the quotients are proven identical): kitti4_ap2 frame 0 single +
   the F=4 stacked composition.
5. tsukuba_sad standard run_benchmark record at batch=64 (the marginal
   r48 number is the honest per-frame cost; this is the record-keeping
   run — 64 frames/iter keeps the ~2.4 ms harness floor < 10%).
"""
import json, os, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
RESULTS = "scripts/tpu_r49_results.json"
results = {}
def rec(k, v):
    results[k] = v
    print(json.dumps({k: v, "t": round(time.time() - T0, 1)}), flush=True)
    json.dump(results, open(RESULTS, "w"), indent=1)

T0 = time.time()


def main():
    import tpustereo
    tpustereo.enable_compilation_cache()
    import jax, jax.numpy as jnp
    from tpustereo.config import PRESETS
    from tpustereo.eval.bench import run_benchmark, production_stage_times
    from tpustereo.pipeline.sgbm import sgbm, sgbm_frames
    rec("device", str(jax.devices()[0].device_kind))

    # 1) final headline, 3 runs
    try:
        vals = []
        for _ in range(3):
            r = run_benchmark(PRESETS["kitti_sgm8"], shape=(375, 1242),
                              batch=16, iters=20)
            vals.append(r["value"])
        vals.sort()
        rec("headline/kitti8_fps_3run", vals)
        rec("headline/kitti8_fps_mean", round(sum(vals) / 3, 3))
    except Exception as e:
        rec("error/headline", repr(e)[:400]); traceback.print_exc()

    cfg_a = PRESETS["kitti_sgm8"].replace(adaptive_p2=True)

    # 2) adaptive at HEAD (f32-div p2_map)
    try:
        r = run_benchmark(cfg_a, shape=(375, 1242), batch=16, iters=20)
        rec("ap2/F4_fps_fdiv", r["value"])
    except Exception as e:
        rec("error/ap2_fdiv", repr(e)[:400]); traceback.print_exc()

    # 3) adaptive stages decomposition
    try:
        from tpustereo.data.synthetic import synthetic_pair
        L, R, _, _ = synthetic_pair((375, 1242), disparity=40.0,
                                    slope=0.02, seed=0)
        lefts = jnp.asarray(np.stack([L] * 16))
        rights = jnp.asarray(np.stack([R] * 16))
        st = production_stage_times(cfg_a, lefts, rights, iters=20)
        rec("ap2/stage_ms", st)
    except Exception as e:
        rec("error/ap2_stages", repr(e)[:400]); traceback.print_exc()

    # 4) adaptive exactness re-gate (f32-div maps; refs proven unchanged)
    try:
        d = np.load("/tmp/r48_refs/kitti4_ap2.npz")
        out = np.asarray(sgbm(jnp.asarray(d["L0"]), jnp.asarray(d["R0"]),
                              cfg_a.replace(frames_per_step=1)))
        want = d["out0"]
        vg, vw = out >= 0, want >= 0
        both = vg & vw
        rec("ap2exact/single_mismatch", int((vg != vw).sum()))
        rec("ap2exact/single_max_abs",
            float(np.abs(out - want)[both].max()) if both.any() else 0.0)
        Ls = jnp.asarray(np.stack([d[f"L{f}"] for f in range(4)]))
        Rs = jnp.asarray(np.stack([d[f"R{f}"] for f in range(4)]))
        outs = np.asarray(sgbm_frames(Ls, Rs, cfg_a))
        wants = np.stack([d[f"out{f}"] for f in range(4)])
        vg, vw = outs >= 0, wants >= 0
        both = vg & vw
        rec("ap2exact/F4_mismatch", int((vg != vw).sum()))
        rec("ap2exact/F4_max_abs",
            float(np.abs(outs - wants)[both].max()) if both.any() else 0.0)
    except Exception as e:
        rec("error/ap2_exact", repr(e)[:400]); traceback.print_exc()

    # 5) tsukuba standard record at batch=64
    try:
        r = run_benchmark(PRESETS["tsukuba_sad"], shape=(288, 384),
                          batch=64, iters=20)
        rec("sad/tsukuba_b64_fps", r["value"])
        rec("sad/tsukuba_b64_ms", r["ms_per_frame"])
    except Exception as e:
        rec("error/tsukuba", repr(e)[:400]); traceback.print_exc()

    rec("total_wall_s", round(time.time() - T0, 1))

if __name__ == "__main__":
    sys.exit(main())
