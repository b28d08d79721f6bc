"""Pinned TRAJECTORY-metric regression (SURVEY.md §4.4, §5.5; VERDICT r3
next #5): config-5 accuracy as a number with a regression test, not a
tolerance assert. ATE/RPE of the full odometry loop on a fixed synthetic
sequence are asserted against STORED values in
tests/data/pinned_odometry.json.

To intentionally re-pin after a semantics change:
    python tests/test_pinned_odometry.py --regen
and commit the diff with a justification.
"""

import json
import os
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
if os.path.dirname(_HERE) not in sys.path:  # `python tests/...py --regen`
    sys.path.insert(0, os.path.dirname(_HERE))

PIN_PATH = os.path.join(_HERE, "data", "pinned_odometry.json")

SEQ = dict(n_frames=8, shape=(96, 128), depth=8.0, fx=200.0, baseline=0.5,
           step_x=0.08, slant=0.35, seed=3)

# metres / degrees of allowed cross-platform float drift: the GN pose and
# subpixel parabola are float32, so identical platforms reproduce to
# ~1e-6; 2e-3 m / 0.05 deg catches any real estimator regression (which
# moves these by centimetres/tenths)
ATE_TOL = 2e-3
RPE_T_TOL = 2e-3
RPE_R_TOL = 0.05


def _compute():
    from tpustereo.config import Config
    from tpustereo.data.synthetic import synthetic_sequence
    from tpustereo.eval.metrics import ate, rpe
    from tpustereo.odometry import OdometryConfig, StereoOdometry

    calib, frames, gt = synthetic_sequence(**SEQ)
    cfg = Config(num_disparities=32, paths=8, speckle_window_size=50)
    odo = StereoOdometry(calib, cfg, OdometryConfig(loop_closure=False))
    for L, R in frames:
        odo.step(L, R)
    traj = odo.trajectory()
    assert len(traj) == len(gt)
    a = ate(traj, gt)
    r = rpe(traj, gt, delta=1)
    return {"ate_rmse": a["rmse"], "ate_max": a["max"],
            "rpe_trans_rmse": r["trans_rmse"],
            "rpe_rot_rmse_deg": r["rot_rmse_deg"]}


@pytest.mark.slow
def test_pinned_odometry_trajectory():
    assert os.path.exists(PIN_PATH), \
        "run `python tests/test_pinned_odometry.py --regen` once"
    pinned = json.load(open(PIN_PATH))
    got = _compute()
    for k, v in pinned.items():
        tol = (ATE_TOL if k.startswith("ate")
               else RPE_R_TOL if "rot" in k else RPE_T_TOL)
        assert abs(got[k] - v) <= tol, (k, got[k], v)


def test_rpe_ate_identity():
    """Sanity: a trajectory equal to GT scores zero everywhere; a shifted
    one scores zero ATE after alignment but its raw final error is not
    zero (alignment really ran)."""
    from tpustereo.eval.metrics import ate, rpe
    rng = np.random.default_rng(0)
    n = 10
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, :3, 3] = np.cumsum(rng.normal(0, 0.1, (n, 3)), axis=0)
    assert ate(gt, gt)["rmse"] == pytest.approx(0.0, abs=1e-9)
    assert rpe(gt, gt)["trans_rmse"] == pytest.approx(0.0, abs=1e-9)
    shifted = gt.copy()
    shifted[:, :3, 3] += np.array([5.0, -2.0, 1.0])
    assert ate(shifted, gt)["rmse"] == pytest.approx(0.0, abs=1e-7)
    # a rotated-in-place estimate has zero ATE only if rotation is rigid
    th = 0.3
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    rot = gt.copy()
    rot[:, :3, 3] = gt[:, :3, 3] @ Rz.T
    assert ate(rot, gt)["rmse"] == pytest.approx(0.0, abs=1e-7)
    # RPE is alignment-free: corrupt one step and it must show up
    bad = gt.copy()
    bad[5, :3, 3] += 0.05
    assert rpe(bad, gt)["trans_rmse"] > 0.01


if __name__ == "__main__":
    # pins are CPU numbers (the suite runs on the fake CPU mesh; the
    # tunnelled dev chip must also not be disturbed by a regen)
    import jax
    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        vals = _compute()
        os.makedirs(os.path.dirname(PIN_PATH), exist_ok=True)
        json.dump(vals, open(PIN_PATH, "w"), indent=1)
        print(f"wrote {PIN_PATH}: {vals}")
    else:
        print(__doc__)


def test_kitti_segment_errors_synthetic_path():
    """Segment errors on a long synthetic path: zero for a perfect
    estimate; a constant 1%-scale drift in translation shows up as
    ~1% t_err; too-short paths return NaN with n_segments=0."""
    from tpustereo.eval.metrics import kitti_segment_errors
    n = 1200
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 0, 3] = np.arange(n) * 1.0          # 1 m per frame along +x
    out = kitti_segment_errors(gt, gt)
    assert out["n_segments"] > 0
    assert out["t_err_pct"] == pytest.approx(0.0, abs=1e-9)
    drift = gt.copy()
    drift[:, 0, 3] *= 1.01                    # 1% scale drift
    out = kitti_segment_errors(drift, gt)
    assert out["t_err_pct"] == pytest.approx(1.0, rel=0.05)
    short = kitti_segment_errors(gt[:50], gt[:50])
    assert short["n_segments"] == 0 and np.isnan(short["t_err_pct"])
