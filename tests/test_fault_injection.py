"""Process-kill fault injection (SURVEY.md §5.3): a REAL odometry process
(the CLI, checkpointing every frame) is SIGKILLed mid-sequence, resumed
from its checkpoint with `--resume`, and the stitched trajectory must
equal an uninterrupted run — doubling as the CLI --resume integration
test. The in-process twin lives in test_odometry_resume.py; this one
kills the actual OS process."""

import os
import signal
import subprocess
import sys
import time

import numpy as np

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# 60 frames, not 8: the round-3 fused odometry step runs a steady-state
# frame in single-digit milliseconds, so a short sequence could FINISH
# before the kill below lands (observed flake) — the long tail guarantees
# hundreds of milliseconds of remaining work at first-checkpoint time
_N_FRAMES = 60
_FLAGS = ["--max-frames", str(_N_FRAMES),
          "--set", "num_disparities=16", "--set", "speckle_window_size=0",
          "--set", "median_filter=false", "--set", "uniqueness_ratio=0"]


def _env():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    return env


def _run_cli(extra, timeout=500):
    p = subprocess.run(
        [sys.executable, "-m", "tpustereo.cli"] + extra,
        capture_output=True, text=True, env=_env(), cwd=_REPO,
        timeout=timeout)
    assert p.returncode == 0, (p.returncode, p.stdout, p.stderr[-3000:])
    return p


@pytest.mark.slow
def test_process_kill_resume_matches_uninterrupted(tmp_path):
    traj_full = str(tmp_path / "full.txt")
    traj_res = str(tmp_path / "resumed.txt")
    ckpt = str(tmp_path / "ckpt.npz")

    # 1) uninterrupted reference run
    _run_cli(["odometry", "--out", traj_full] + _FLAGS)

    # 2) run with per-frame checkpoints; SIGKILL it mid-sequence (as soon
    #    as a checkpoint exists and a few frames were processed)
    p = subprocess.Popen(
        [sys.executable, "-m", "tpustereo.cli", "odometry",
         "--checkpoint", ckpt, "--checkpoint-every", "1"] + _FLAGS,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_env(), cwd=_REPO)
    deadline = time.time() + 400
    killed = False
    while time.time() < deadline:
        if os.path.exists(ckpt) and os.path.getsize(ckpt) > 0:
            # checkpoints are written atomically (tmp + os.replace in
            # PoseGraph.save), so the file is valid the instant it
            # exists — kill NOW, before the fast loop can finish
            os.kill(p.pid, signal.SIGKILL)
            killed = True
            break
        if p.poll() is not None:
            break
        time.sleep(0.005)
    out, err = p.communicate(timeout=60)
    assert killed, f"never saw a checkpoint; rc={p.returncode}\n{err[-3000:]}"
    assert p.returncode != 0  # it really was killed

    # 3) resume from the checkpoint and finish the sequence
    r = _run_cli(["odometry", "--checkpoint", ckpt, "--resume",
                  "--out", traj_res] + _FLAGS)
    assert "resumed at frame" in r.stderr, r.stderr[-2000:]

    a = np.loadtxt(traj_full)
    b = np.loadtxt(traj_res)
    assert a.shape == b.shape == (_N_FRAMES, 12)
    np.testing.assert_allclose(a, b, atol=1e-5)
