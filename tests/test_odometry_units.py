"""Unit tests for the odometry submodules (SURVEY.md §3 #19): SE(3) maps,
Gauss-Newton PnP on synthetic geometry, feature detect/match, pose-graph
optimisation with a loop closure."""

import numpy as np
import jax.numpy as jnp

from tpustereo.odometry.se3 import exp_se3, inv_se3, log_se3
from tpustereo.odometry.pnp import gauss_newton_pose, project
from tpustereo.odometry.features import detect_corners, describe, match_descriptors
from tpustereo.odometry.pose_graph import PoseGraph

import pytest


def _rand_twist(rng, rot=0.2, trans=0.5):
    w = rng.normal(0, rot, 3)
    v = rng.normal(0, trans, 3)
    return np.concatenate([v, w]).astype(np.float32)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        xi = _rand_twist(rng)
        T = np.asarray(exp_se3(jnp.asarray(xi)))
        # valid rigid transform
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(T[:3, :3]), 1.0, atol=1e-5)
        xi2 = np.asarray(log_se3(jnp.asarray(T)))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)
        Tinv = np.asarray(inv_se3(jnp.asarray(T)))
        np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-5)


def test_gauss_newton_recovers_pose():
    rng = np.random.default_rng(1)
    fx = fy = 400.0
    cx, cy = 64.0, 48.0
    X = rng.uniform([-2, -1.5, 4], [2, 1.5, 12], (120, 3)).astype(np.float32)
    T_true = np.asarray(exp_se3(jnp.asarray(_rand_twist(rng, 0.05, 0.2))))
    P = X @ T_true[:3, :3].T + T_true[:3, 3]
    u = np.array(project(jnp.asarray(P), fx, fy, cx, cy))
    w = np.ones(120, np.float32)
    w[:10] = 0.0  # invalid matches must not perturb the solution
    u[:10] += 500.0
    T, res = gauss_newton_pose(jnp.asarray(X), jnp.asarray(u), jnp.asarray(w),
                               jnp.asarray([fx, fy, cx, cy], jnp.float32))
    np.testing.assert_allclose(np.asarray(T), T_true, atol=1e-3)
    assert float(res) < 1e-2


def test_gauss_newton_huber_rejects_outliers():
    rng = np.random.default_rng(2)
    fx = fy = 400.0
    cx, cy = 64.0, 48.0
    X = rng.uniform([-2, -1.5, 4], [2, 1.5, 12], (150, 3)).astype(np.float32)
    T_true = np.asarray(exp_se3(jnp.asarray(_rand_twist(rng, 0.04, 0.15))))
    P = X @ T_true[:3, :3].T + T_true[:3, 3]
    u = np.array(project(jnp.asarray(P), fx, fy, cx, cy))
    u[:20] += rng.normal(0, 40.0, (20, 2))  # gross outliers, weight 1
    T, _ = gauss_newton_pose(jnp.asarray(X), jnp.asarray(u),
                             jnp.ones(150, jnp.float32),
                             jnp.asarray([fx, fy, cx, cy], jnp.float32),
                             iters=15)
    np.testing.assert_allclose(np.asarray(T), T_true, atol=0.05)


def test_corner_detect_and_match_identity():
    rng = np.random.default_rng(3)
    img = (rng.uniform(0, 255, (96, 128))).astype(np.uint8)
    pts, valid = detect_corners(jnp.asarray(img), max_corners=64)
    pts, valid = np.asarray(pts), np.asarray(valid)
    assert valid.sum() >= 32
    H, W = img.shape
    assert (pts[valid][:, 0] >= 0).all() and (pts[valid][:, 0] < H).all()
    desc = describe(jnp.asarray(img), jnp.asarray(pts))
    # matching an image against itself must be the identity on valid corners
    idx, good = match_descriptors(desc, desc, jnp.asarray(valid),
                                  jnp.asarray(valid), min_similarity=0.9)
    idx, good = np.asarray(idx), np.asarray(good)
    sel = good & valid
    assert sel.sum() >= 32
    np.testing.assert_array_equal(idx[sel], np.arange(len(idx))[sel])


def test_pose_graph_loop_closure_reduces_drift():
    rng = np.random.default_rng(4)
    # ground truth: N keyframes along a line; odometry edges with noise,
    # plus an exact loop-closure edge 0 -> N-1
    N = 8
    true_step = np.asarray(exp_se3(jnp.asarray(
        np.array([0.5, 0, 0, 0, 0, 0], np.float32))))
    truth = [np.eye(4, dtype=np.float32)]
    for _ in range(N - 1):
        truth.append((truth[-1] @ true_step).astype(np.float32))

    g = PoseGraph()
    noisy = np.eye(4, dtype=np.float32)
    g.add_keyframe(noisy)
    for i in range(1, N):
        noise = exp_se3(jnp.asarray(
            np.concatenate([rng.normal(0, 0.03, 3),
                            rng.normal(0, 0.01, 3)]).astype(np.float32)))
        step = (true_step @ np.asarray(noise)).astype(np.float32)
        noisy = (noisy @ step).astype(np.float32)
        g.add_keyframe(noisy)
        g.add_edge(i - 1, i, step)
    # exact loop closure with high weight
    T0N = np.linalg.inv(truth[0]) @ truth[N - 1]
    g.add_edge(0, N - 1, T0N.astype(np.float32), weight=10.0)

    def errs():
        return np.linalg.norm(np.stack(g.poses)[:, :3, 3] -
                              np.stack(truth)[:, :3, 3], axis=-1)

    before_end, before_max = errs()[-1], errs().max()
    g.optimize(iters=15)
    after_end, after_max = errs()[-1], errs().max()
    # the closure pins the endpoint; overall drift must not grow
    assert after_end < before_end * 0.35, (before_end, after_end)
    assert after_max <= before_max * 1.05, (before_max, after_max)


def test_end_to_end_trajectory_on_consistent_sequence():
    """Full config-5 flow: SGM disparity -> features -> GN pose -> pose
    graph, on a geometrically consistent slanted-plane sequence with known
    ground-truth motion (SURVEY.md §4.4)."""
    from tpustereo.api import run_sequence
    from tpustereo.config import Config
    from tpustereo.data.synthetic import synthetic_sequence

    calib, frames, gt = synthetic_sequence(
        n_frames=6, shape=(96, 128), depth=8.0, fx=200.0, baseline=0.5,
        step_x=0.08, slant=0.35, seed=5)
    cfg = Config(num_disparities=24, speckle_window_size=0,
                 median_filter=False)
    traj = run_sequence(frames, calib, cfg)
    err = np.linalg.norm(traj[:, :3, 3] - gt[:, :3, 3], axis=-1)
    dist = np.linalg.norm(gt[-1, :3, 3])
    # the narrow-FOV planar scene leaves a mild tx/yaw ambiguity; 20% of
    # distance travelled bounds the drift well above observed (~10%)
    assert err[-1] < 0.2 * dist, (err, dist)
    # motion direction must be +x and roughly monotone
    assert traj[-1, 0, 3] > 0.6 * gt[-1, 0, 3]


@pytest.mark.slow
def test_loop_closure_detection_on_out_and_back():
    """Out-and-back trajectory (VERDICT r1 weak #8): the detector must find
    at least one appearance+geometry-verified closure between distant
    keyframes and the re-optimised endpoint must land back near the start."""
    from tpustereo.config import Config
    from tpustereo.data.synthetic import synthetic_sequence
    from tpustereo.odometry import OdometryConfig, StereoOdometry

    out = [i * 0.08 for i in range(8)]
    cam_xs = out + out[::-1][1:]          # 15 frames, ends where it began
    calib, frames, gt = synthetic_sequence(
        shape=(96, 128), depth=8.0, fx=200.0, baseline=0.5, slant=0.35,
        seed=5, cam_xs=cam_xs)
    cfg = Config(num_disparities=24, speckle_window_size=0,
                 median_filter=False)
    ocfg = OdometryConfig(keyframe_translation=0.05, lc_min_gap=6,
                          lc_min_matches=25)
    odo = StereoOdometry(calib, cfg, ocfg)
    for L, R in frames:
        odo.step(L, R)
    assert odo.closures, "no loop closure detected on a revisited viewpoint"
    assert any(b - a >= 6 for a, b in odo.closures)
    traj = odo.trajectory()
    err_end = float(np.linalg.norm(traj[-1, :3, 3] - gt[-1, :3, 3]))

    # without closures the same run must not beat the closed one materially
    odo_open = StereoOdometry(
        calib, cfg, OdometryConfig(keyframe_translation=0.05,
                                   loop_closure=False))
    for L, R in frames:
        odo_open.step(L, R)
    err_open = float(np.linalg.norm(
        odo_open.trajectory()[-1, :3, 3] - gt[-1, :3, 3]))
    assert err_end < max(0.05, err_open * 1.05), (err_end, err_open)


@pytest.mark.slow
def test_fused_track_frames_matches_per_frame_steps():
    """The F-stacked tracking program must equal F single fused steps
    against the same keyframe (same disparities via the bit-exact
    sgbm_frames path; features/GN are frame-independent)."""
    from tpustereo.config import Config
    from tpustereo.data.synthetic import synthetic_sequence
    from tpustereo.odometry import OdometryConfig
    from tpustereo.odometry.fused import fused_track_frames, fused_track_step
    cfg = Config(num_disparities=16, speckle_window_size=20)
    ocfg = OdometryConfig(max_corners=128)
    calib, frames, _ = synthetic_sequence(
        n_frames=3, shape=(48, 64), depth=8.0, fx=200.0, baseline=0.5,
        step_x=0.08, slant=0.35, seed=3)
    intr = jnp.asarray([calib.fx, calib.fy, calib.cx, calib.cy], jnp.float32)
    b = jnp.float32(calib.baseline)
    zeros = (jnp.zeros((128, 64), jnp.float32), jnp.zeros((128,), bool),
             jnp.zeros((128, 3), jnp.float32))
    kf0 = fused_track_step(jnp.asarray(frames[0][0]),
                           jnp.asarray(frames[0][1]), *zeros, intr, b,
                           cfg, ocfg)
    kf = (kf0.desc, kf0.valid, kf0.X)
    Ls = jnp.stack([jnp.asarray(L) for L, _ in frames[1:]])
    Rs = jnp.stack([jnp.asarray(R) for _, R in frames[1:]])
    chunk = fused_track_frames(Ls, Rs, *kf, intr, b, cfg, ocfg)
    for f in range(2):
        single = fused_track_step(Ls[f], Rs[f], *kf, intr, b, cfg, ocfg)
        np.testing.assert_array_equal(np.asarray(chunk.disp[f]),
                                      np.asarray(single.disp))
        np.testing.assert_allclose(np.asarray(chunk.T[f]),
                                   np.asarray(single.T), atol=1e-5)
        assert int(chunk.n_matches[f]) == int(single.n_matches)
