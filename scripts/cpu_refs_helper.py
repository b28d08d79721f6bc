"""Compute CPU-truth pipeline outputs for the on-chip exactness gates.

Run as a SUBPROCESS (forces jax_platforms=cpu before importing jax) by the
TPU batch scripts; writes one .npz per case. Rationale: the jnp fallback
pipeline miscompiles ON THE TPU at 750x1500 (XLA bug, r19 diag — rows >=
376 wrong while pallas matched CPU truth at every stage), so jnp-on-TPU
cannot serve as the exactness reference; CPU execution of the same jnp
path is bit-exact vs the golden NumPy oracle (test suite) and compiles in
seconds instead of the TPU's 5-30+ minutes.

Usage: python scripts/cpu_refs_helper.py OUT.npz CASE
Cases: kitti4 (4 KITTI frames, kitti_sgm8 F=1), midhalf (750x1500
middlebury_sgm4), midfull (1500x3000 middlebury_sgm4), small (120x320
kitti_sgm8 F=1).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import os  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpustereo.config import PRESETS  # noqa: E402
from tpustereo.data.synthetic import synthetic_pair  # noqa: E402
from tpustereo.pipeline.sgbm import sgbm  # noqa: E402


def run(cfg, shape, disparity, slope, seed):
    L, R, _, _ = synthetic_pair(shape, disparity=disparity, slope=slope,
                                seed=seed)
    out = np.asarray(sgbm(jnp.asarray(L), jnp.asarray(R),
                          cfg.replace(backend="jnp")))
    return L, R, out


def main():
    out_path, case = sys.argv[1], sys.argv[2]
    k1 = PRESETS["kitti_sgm8"].replace(frames_per_step=1)
    cfg_h = PRESETS["middlebury_sgm4"]
    data = {}
    if case == "small":
        L, R, out = run(k1, (120, 320), 20.0, 0.05, 1)
        data = {"L": L, "R": R, "out": out}
    elif case == "kitti4":
        for f in range(4):
            L, R, out = run(k1, (375, 1242), 30.0 + 10 * f, 0.02, f)
            data[f"L{f}"], data[f"R{f}"], data[f"out{f}"] = L, R, out
    elif case == "midhalf":
        L, R, out = run(cfg_h, (750, 1500), 60.0, 0.03, 9)
        data = {"L": L, "R": R, "out": out}
    elif case == "midfull":
        L, R, out = run(cfg_h, (1500, 3000), 100.0, 0.03, 10)
        data = {"L": L, "R": R, "out": out}
    elif case == "tsukuba":
        L, R, out = run(PRESETS["tsukuba_sad"], (288, 384), 12.0, 0.03, 3)
        data = {"L": L, "R": R, "out": out}
    elif case == "tsukuba_lr":
        # LR check + min_disparity through the fused SAD kernel's
        # incremental right-WTA carry (r5)
        L, R, out = run(PRESETS["tsukuba_sad"].replace(
            disp12_max_diff=1, min_disparity=8), (288, 384), 20.0, 0.04, 5)
        data = {"L": L, "R": R, "out": out}
    elif case == "tsukuba_b11":
        # block 11 (the o2/smsp 15-bit field packing edge: S <= 30855)
        # with D = 128 (7-bit plane index)
        L, R, out = run(PRESETS["tsukuba_sad"].replace(
            sad_block=11, num_disparities=128), (288, 384), 40.0, 0.1, 6)
        data = {"L": L, "R": R, "out": out}
    elif case == "kitti4_ap2":
        # adaptive P2 x frame stacking (r5): 4 singles on CPU are the
        # reference for the F=4 stacked on-chip run
        for f in range(4):
            L, R, out = run(k1.replace(adaptive_p2=True), (375, 1242),
                            30.0 + 8 * f, 0.03, 20 + f)
            data[f"L{f}"], data[f"R{f}"], data[f"out{f}"] = L, R, out
    elif case == "census_wta":
        L, R, out = run(PRESETS["middlebury_census_wta"], (375, 621),
                        25.0, 0.03, 4)
        data = {"L": L, "R": R, "out": out}
    elif case == "mindisp":
        # min_disparity > 0 through the fused path (r4): KITTI geometry,
        # search window [16, 144)
        L, R, out = run(k1.replace(min_disparity=16), (375, 1242),
                        45.0, 0.03, 12)
        data = {"L": L, "R": R, "out": out}
    elif case == "d256":
        # D = 256 (two 128-lane blocks) at KITTI geometry; disparity
        # content spans past 128 so the upper lane block decides pixels
        L, R, out = run(k1.replace(num_disparities=256), (375, 1242),
                        150.0, 0.05, 13)
        data = {"L": L, "R": R, "out": out}
    elif case == "adaptive":
        # adaptive P2 (OpenCV-style edge-scaled penalties) through the
        # fused path — the bf16 sweep branch takes per-direction P2 maps
        # (r4); exactness needs an on-chip gate (interpret cannot catch
        # Mosaic bugs)
        L, R, out = run(k1.replace(adaptive_p2=True), (375, 1242),
                        40.0, 0.03, 16)
        data = {"L": L, "R": R, "out": out}
    elif case == "census97":
        # 9x7 census (62 bits, c_max = 62 — the largest gated cost bound;
        # exercises the two-bitplane cost path + the bf16 gate's 62+120
        # envelope) at KITTI geometry
        L, R, out = run(k1.replace(census_window=(9, 7)), (375, 1242),
                        35.0, 0.03, 15)
        data = {"L": L, "R": R, "out": out}
    elif case == "d512":
        # D = 512 (four lane blocks, 9/10-bit pack shift); content past
        # d = 256 so the upper blocks decide real pixels
        L, R, out = run(k1.replace(num_disparities=512), (256, 960),
                        300.0, 0.1, 14)
        data = {"L": L, "R": R, "out": out}
    else:
        raise SystemExit(f"unknown case {case}")
    np.savez_compressed(out_path, **data)
    print(f"saved {out_path}", flush=True)


if __name__ == "__main__":
    main()
