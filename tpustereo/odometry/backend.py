"""Stereo visual odometry backend (cv_slam tier; SURVEY.md §3 #19, §4.4).

Per frame: ONE fused device program (`odometry.fused.fused_track_step`)
computes disparity (full TPU pipeline) + Harris corners + NCC-patch
descriptors + keyframe matching (one MXU matmul) + Huber-GN pose; the host
receives only the small (T, residual, n_matches) triple for the keyframe
decision and pose-graph bookkeeping (two programs in strip-tiled config-5
mode: tiled matcher, then tracking). Keyframe feature state stays resident
on the device between frames. State is checkpointable (SURVEY.md §5.4) so
a killed run resumes at the last keyframe.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpustereo.config import Config
from tpustereo.data.datasets import KittiCalib
from tpustereo.odometry.pnp import gauss_newton_pose
from tpustereo.odometry.pose_graph import PoseGraph
from tpustereo.odometry.se3 import inv_se3

# describe() emits 8x8 normalized patches; the bootstrap zero-keyframe
# state must match its static descriptor width
_DESC_DIM = 64


def _inv_se3_np(T: np.ndarray) -> np.ndarray:
    """Host-side SE(3) inverse — the per-frame pose update must not pay a
    device dispatch for a 4x4 inverse."""
    out = np.eye(4, dtype=np.float32)
    R, t = T[:3, :3], T[:3, 3]
    out[:3, :3] = R.T
    out[:3, 3] = -R.T @ t
    return out


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    max_corners: int = 512
    min_similarity: float = 0.6
    gn_iters: int = 10
    keyframe_translation: float = 0.3   # new keyframe beyond this motion (m)
    keyframe_rotation: float = 0.05     # or beyond this rotation (rad, approx)
    keyframe_min_matches: int = 40      # or when tracking starves
    optimize_every: int = 5             # pose-graph GN every K keyframes
    min_depth: float = 0.5
    max_depth: float = 80.0
    # --- loop closure (drift correction) -------------------------------
    loop_closure: bool = True
    lc_min_gap: int = 6        # keyframe-index gap before a pair is eligible
    lc_min_matches: int = 30   # tentative mutual matches to attempt PnP
    lc_max_residual: float = 2.0  # px; geometric-verification gate
    lc_max_candidates: int = 100  # cap on appearance checks per keyframe


@dataclasses.dataclass
class _Keyframe:
    index: int               # pose-graph node id
    pts: np.ndarray          # (K, 2) int32 [y, x]
    desc: np.ndarray         # (K, P) float32
    X: np.ndarray            # (K, 3) float32 3D points (camera frame)
    valid: np.ndarray        # (K,) bool (corner valid & depth valid)


class StereoOdometry:
    def __init__(self, calib: KittiCalib, cfg: Optional[Config] = None,
                 ocfg: Optional[OdometryConfig] = None, mesh=None):
        self.calib = calib
        self.cfg = cfg or Config()
        self.ocfg = ocfg or OdometryConfig()
        # config 5 (SURVEY.md §4.4): with cfg.strips > 1 the matcher runs
        # strip-tiled over the mesh; built lazily so host-only uses never
        # touch devices
        self._mesh = mesh
        self.graph = PoseGraph()
        self.kf: Optional[_Keyframe] = None
        self.kfs: List[_Keyframe] = []   # keyframe database for loop closure
        self.closures: List[Tuple[int, int]] = []  # accepted closure edges
        self.pose = np.eye(4, dtype=np.float32)      # world <- current cam
        self._traj: List[np.ndarray] = []
        self._frames = 0
        self._intr = jnp.asarray([calib.fx, calib.fy, calib.cx, calib.cy],
                                 jnp.float32)
        self._baseline = jnp.float32(calib.baseline)
        # keyframe feature state resident on device (desc, valid, X) —
        # re-uploading it every frame would waste a host->device transfer
        self._kf_dev = None

    # ------------------------------------------------------------------
    def _kf_state(self):
        if self._kf_dev is not None:
            return self._kf_dev
        # bootstrap: all-zero state — matching finds nothing, GN holds I
        K = self.ocfg.max_corners
        return (jnp.zeros((K, _DESC_DIM), jnp.float32),
                jnp.zeros((K,), bool), jnp.zeros((K, 3), jnp.float32))

    def _match_device(self, left, right):
        """Strip-tiled disparity (BASELINE config 5) as a DEVICE array —
        the tiled program's output feeds the tracking program directly,
        never visiting the host."""
        from tpustereo.dist import sgbm_tiled  # late import: spy-able
        if self._mesh is None:
            from tpustereo.dist import make_mesh
            self._mesh = make_mesh(data=1, strip=self.cfg.strips)
        return sgbm_tiled(left, right, self.cfg, self._mesh)

    def _store_keyframe(self, out) -> _Keyframe:
        """Materialize a keyframe from a fused TrackOut: numpy copies for
        the graph/checkpoint/loop-closure machinery, device handles kept
        for next frame's matching."""
        pts, desc, valid, X = jax.device_get((out.pts, out.desc, out.valid,
                                              out.X))
        node = self.graph.add_keyframe(self.pose)
        kf = _Keyframe(node, pts, desc, X, valid)
        self.kfs.append(kf)
        self._kf_dev = (out.desc, out.valid, out.X)
        return kf

    # ------------------------------------------------------------------
    def step(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        """Process one rectified pair; returns the current world pose.

        Device dispatches per tracked frame: ONE (the fused program), or
        TWO with cfg.strips > 1 (tiled matcher + tracking program); plus
        one small device_get for the keyframe decision. Keyframe frames
        add one device_get (feature materialization) and the occasional
        pose-graph/loop-closure work (SURVEY.md §4.4)."""
        from tpustereo.api import _as_u8  # avoid cycle
        from tpustereo.odometry.fused import (fused_track_from_disp,
                                              fused_track_step)
        l8 = _as_u8(left)
        kf_desc, kf_valid, kf_X = self._kf_state()
        if self.cfg.strips > 1:
            disp = self._match_device(l8, _as_u8(right))
            out = fused_track_from_disp(l8, disp, kf_desc, kf_valid, kf_X,
                                        self._intr, self._baseline,
                                        self.cfg, self.ocfg)
        else:
            out = fused_track_step(l8, _as_u8(right), kf_desc, kf_valid,
                                   kf_X, self._intr, self._baseline,
                                   self.cfg, self.ocfg)
        self._frames += 1

        if self.kf is None:
            self.kf = self._store_keyframe(out)
            self._traj.append(self.pose.copy())
            return self.pose

        # one transfer for everything the host decision needs
        T, n_matches = jax.device_get((out.T, out.n_matches))
        n_matches = int(n_matches)
        T = np.asarray(T)  # kf cam -> current cam
        kf_pose = self.graph.poses[self.kf.index]
        self.pose = (kf_pose @ _inv_se3_np(T)).astype(np.float32)
        self._traj.append(self.pose.copy())

        trans = float(np.linalg.norm(T[:3, 3]))
        rot = float(np.arccos(np.clip((np.trace(T[:3, :3]) - 1) / 2, -1, 1)))
        if (trans > self.ocfg.keyframe_translation
                or rot > self.ocfg.keyframe_rotation
                or n_matches < self.ocfg.keyframe_min_matches):
            new_kf = self._store_keyframe(out)
            self.graph.add_edge(self.kf.index, new_kf.index,
                                _inv_se3_np(T),
                                weight=min(1.0, n_matches / 100.0))
            self.kf = new_kf
            closed = self.ocfg.loop_closure and self._loop_closure(new_kf)
            if (not closed
                    and len(self.graph.poses) % self.ocfg.optimize_every == 0):
                self.graph.optimize()
                self.pose = self.graph.poses[self.kf.index].copy()
        return self.pose

    # ------------------------------------------------------------------
    def _loop_closure(self, new_kf: _Keyframe) -> bool:
        """Loop-closure detection + geometric verification (SURVEY.md §4.4).

        Appearance candidate: every stored keyframe at least lc_min_gap
        indices back is NCC-matched against the new keyframe — ALL
        candidates in one batched device program (a stack of MXU matmuls,
        `fused.batched_candidate_match`); the best candidate with >=
        lc_min_matches mutual matches goes to geometric verification — Huber-GN PnP of the old keyframe's 3D points onto
        the new keyframe's pixels. A closure is accepted only if the mean
        weighted reprojection residual passes lc_max_residual; the edge is
        added and the whole graph re-optimised immediately, which is what
        actually corrects accumulated drift."""
        elig = [old for old in self.kfs[:-1]
                if new_kf.index - old.index >= self.ocfg.lc_min_gap]
        if len(elig) > self.ocfg.lc_max_candidates:
            # evenly stride-sample so the check stays O(cap) per keyframe on
            # arbitrarily long sequences while still spanning the whole past
            step = len(elig) / self.ocfg.lc_max_candidates
            elig = [elig[int(i * step)]
                    for i in range(self.ocfg.lc_max_candidates)]
        if not elig:
            return False
        # ONE batched program for every candidate (the old per-candidate
        # loop paid one dispatch each — up to lc_max_candidates tunnel
        # RTTs per keyframe); E padded to a power of two so at most
        # log2(cap) program shapes ever compile
        from tpustereo.odometry.fused import batched_candidate_match
        E = len(elig)
        Ep = 1 << max(0, (E - 1).bit_length())
        K, P = elig[0].desc.shape
        descs = np.zeros((Ep, K, P), np.float32)
        valids = np.zeros((Ep, K), bool)
        for i, old in enumerate(elig):
            descs[i], valids[i] = old.desc, old.valid
        idx_bs, goods, counts = batched_candidate_match(
            jnp.asarray(descs), jnp.asarray(valids),
            jnp.asarray(new_kf.desc), jnp.asarray(new_kf.valid),
            self.ocfg.min_similarity)
        counts = np.asarray(counts)
        e = int(np.argmax(counts))  # first max == the old loop's tie rule
        n = int(counts[e])
        if n < self.ocfg.lc_min_matches:
            return False
        old = elig[e]
        idx_b, good = jax.device_get((idx_bs[e], goods[e]))
        w = (good & old.valid).astype(np.float32)
        u = new_kf.pts[idx_b][:, ::-1].astype(np.float32)
        T, res = gauss_newton_pose(jnp.asarray(old.X), jnp.asarray(u),
                                   jnp.asarray(w), self._intr,
                                   iters=self.ocfg.gn_iters)
        if float(res) > self.ocfg.lc_max_residual:
            return False
        self.graph.add_edge(old.index, new_kf.index,
                            np.asarray(inv_se3(T)),
                            weight=min(2.0, n / 50.0))
        self.closures.append((old.index, new_kf.index))
        self.graph.optimize()
        self.pose = self.graph.poses[new_kf.index].copy()
        return True

    # ------------------------------------------------------------------
    def trajectory(self) -> np.ndarray:
        return np.stack(self._traj) if self._traj else np.zeros((0, 4, 4))

    # --- checkpoint / resume (SURVEY.md §5.4) --------------------------
    def save(self, path: str) -> None:
        assert self.kf is not None, "nothing to checkpoint yet"
        self.graph.save(path, extra=dict(
            kf_index=np.int64(self.kf.index), kf_pts=self.kf.pts,
            kf_desc=self.kf.desc, kf_X=self.kf.X, kf_valid=self.kf.valid,
            cur_pose=self.pose, frames=np.int64(self._frames),
            traj=self.trajectory(),
            # keyframe database (loop closure must survive a resume)
            kfs_index=np.array([k.index for k in self.kfs], np.int64),
            kfs_pts=np.stack([k.pts for k in self.kfs]),
            kfs_desc=np.stack([k.desc for k in self.kfs]),
            kfs_X=np.stack([k.X for k in self.kfs]),
            kfs_valid=np.stack([k.valid for k in self.kfs]),
            closures=np.array(self.closures, np.int64).reshape(-1, 2)))

    @classmethod
    def resume(cls, path: str, calib: KittiCalib, cfg: Optional[Config] = None,
               ocfg: Optional[OdometryConfig] = None) -> "StereoOdometry":
        graph, extra = PoseGraph.load(path)
        self = cls(calib, cfg, ocfg)
        self.graph = graph
        self.kf = _Keyframe(int(extra["kf_index"]), extra["kf_pts"],
                            extra["kf_desc"], extra["kf_X"], extra["kf_valid"])
        if "kfs_index" in extra:
            self.kfs = [
                _Keyframe(int(i), p, d, X, v)
                for i, p, d, X, v in zip(
                    extra["kfs_index"], extra["kfs_pts"], extra["kfs_desc"],
                    extra["kfs_X"], extra["kfs_valid"])]
            self.kf = self.kfs[-1]
            self.closures = [(int(a), int(b)) for a, b in extra["closures"]]
        else:  # pre-loop-closure checkpoint: only the latest keyframe
            self.kfs = [self.kf]
        self.pose = extra["cur_pose"]
        self._frames = int(extra["frames"])
        self._traj = [p for p in extra["traj"]]
        # re-seed the device-resident keyframe state from the checkpoint
        self._kf_dev = (jnp.asarray(self.kf.desc),
                        jnp.asarray(self.kf.valid),
                        jnp.asarray(self.kf.X))
        return self
