"""Data-day ingest rehearsal (SURVEY.md §3 #1, #11; VERDICT r4 next #4):
build REAL-format KITTI-2015 and Middlebury directory trees from synthetic
pairs with analytic GT, then run the exact EVAL.md one-command recipes
through the real CLI — loader -> pipeline -> metrics -> golden delta ->
record — so the recipes are known-good before any dataset exists.

Only the geometry is shrunk (96x160, D=32 via --set) so the subprocess
compiles in seconds on the 1-vCPU host; every flag, path layout, format
(PNG images, uint16*256 KITTI disparity, PFM Middlebury GT) and record
field is the data-day surface.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    return env


def _run_cli(extra, timeout=600):
    p = subprocess.run(
        [sys.executable, "-m", "tpustereo.cli"] + extra,
        capture_output=True, text=True, env=_env(), cwd=_REPO,
        timeout=timeout)
    assert p.returncode == 0, (p.returncode, p.stdout[-2000:],
                               p.stderr[-3000:])
    return p


def _pairs(n, shape=(96, 160), d0=10.0):
    from tpustereo.data.synthetic import synthetic_pair
    out = []
    for i in range(n):
        L, R, gt, valid = synthetic_pair(shape, disparity=d0 + i,
                                         slope=0.04, seed=40 + i)
        out.append((L, R, np.where(valid & (gt > 0), gt, -1.0)))
    return out


@pytest.mark.slow
def test_kitti2015_ingest_end_to_end(tmp_path):
    """The EVAL.md KITTI-2015 recipe runs verbatim against a generated
    training/ tree and records sane metrics + an exact golden delta."""
    from tpustereo.data.io import write_image, write_kitti_disparity
    root = tmp_path / "kitti2015"
    for sub in ("image_2", "image_3", "disp_occ_0"):
        os.makedirs(root / "training" / sub)
    for i, (L, R, gt) in enumerate(_pairs(2)):
        name = f"{i:06d}_10.png"
        write_image(str(root / "training" / "image_2" / name), L)
        write_image(str(root / "training" / "image_3" / name), R)
        write_kitti_disparity(str(root / "training" / "disp_occ_0" / name),
                              gt)
    rec = tmp_path / "EVAL_kitti2015.jsonl"
    _run_cli(["eval", "--preset", "kitti_sgm8",
              "--kitti2015", str(root), "--indices", "0-1", "--golden",
              "--record", str(rec),
              "--set", "num_disparities=32", "--set", "frames_per_step=1"])
    report = json.loads(rec.read_text().splitlines()[0])
    assert [p["pair"] for p in report["pairs"]] == \
        ["kitti2015_000000", "kitti2015_000001"]
    for p in report["pairs"]:
        assert p["tpu_vs_golden_max_abs"] == 0.0
        # KITTI GT is quantized to 1/256 px; analytic-GT metrics hold
        assert p["tpu"]["d1_all"] < 0.05 and p["golden"]["d1_all"] < 0.05
    assert set(report["mean"]) == {"d1_all", "bad_2.0", "bad_1.0", "epe"}


@pytest.mark.slow
def test_middlebury_ingest_end_to_end(tmp_path):
    """The EVAL.md Middlebury recipe (im0/im1/disp0GT.pfm scene dir) runs
    verbatim, full- and half-res."""
    from tpustereo.data.io import write_image, write_pfm
    scene = tmp_path / "Adirondack"
    os.makedirs(scene)
    (L, R, gt), = _pairs(1, shape=(96, 160), d0=12.0)
    write_image(str(scene / "im0.png"), L)
    write_image(str(scene / "im1.png"), R)
    write_pfm(str(scene / "disp0GT.pfm"), np.where(gt > 0, gt, np.inf))
    rec = tmp_path / "EVAL_middlebury.jsonl"
    _run_cli(["eval", "--preset", "middlebury_sgm4",
              "--middlebury", str(scene), "--golden",
              "--record", str(rec),
              "--set", "num_disparities=32", "--set", "frames_per_step=1"])
    _run_cli(["eval", "--preset", "middlebury_sgm4",
              "--middlebury", str(scene), "--half-res",
              "--record", str(rec),
              "--set", "num_disparities=32", "--set", "frames_per_step=1"])
    lines = [json.loads(ln) for ln in rec.read_text().splitlines()]
    full, half = lines
    p = full["pairs"][0]
    assert p["shape"] == [96, 160]
    assert p["tpu_vs_golden_max_abs"] == 0.0
    assert p["tpu"]["d1_all"] < 0.05
    # half-res halves the geometry AND the GT disparities
    q = half["pairs"][0]
    assert q["shape"] == [48, 80]
    assert q["tpu"]["d1_all"] < 0.10
