"""Keyframe pose graph + Gauss–Newton optimizer over SE(3)
(SURVEY.md §3 #19, §4.4 `odometry.pose_graph.optimize`).

Graph state lives on the host (append-only lists, trivially
checkpointable); the optimizer is a jit-compiled GN over the stacked
tangent increments, with Jacobians by forward-mode autodiff — the graphs
here are small (keyframe chains + sparse extra edges), so a dense 6N
normal-equation solve is the right tool.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpustereo.odometry.se3 import exp_se3, inv_se3, log_se3


@partial(jax.jit, static_argnames=("iters",))
def optimize_poses(poses: jnp.ndarray, edges_ij: jnp.ndarray,
                   edges_T: jnp.ndarray, edges_w: jnp.ndarray,
                   iters: int = 10, damping: float = 1e-6) -> jnp.ndarray:
    """GN over keyframe poses. poses (N,4,4) world<-kf; edges (E,2) int32
    (i, j) with measured relative pose T_ij ≈ T_i^{-1} T_j and weight w.
    Pose 0 is gauge-fixed. Returns refined (N,4,4)."""
    N = poses.shape[0]

    def residuals(xi):
        Ts = jax.vmap(exp_se3)(xi.reshape(N, 6))
        P = jnp.einsum("nij,njk->nik", poses, Ts)       # right-perturbed
        Ti = P[edges_ij[:, 0]]
        Tj = P[edges_ij[:, 1]]
        rel = jnp.einsum("eij,ejk->eik", jax.vmap(inv_se3)(Ti), Tj)
        err = jnp.einsum("eij,ejk->eik", jax.vmap(inv_se3)(edges_T), rel)
        r = jax.vmap(log_se3)(err) * edges_w[:, None]
        return r.reshape(-1)

    def body(poses_cur, _):
        def res(xi):
            Ts = jax.vmap(exp_se3)(xi.reshape(N, 6))
            P = jnp.einsum("nij,njk->nik", poses_cur, Ts)
            Ti = P[edges_ij[:, 0]]
            Tj = P[edges_ij[:, 1]]
            rel = jnp.einsum("eij,ejk->eik", jax.vmap(inv_se3)(Ti), Tj)
            err = jnp.einsum("eij,ejk->eik", jax.vmap(inv_se3)(edges_T), rel)
            return (jax.vmap(log_se3)(err) * edges_w[:, None]).reshape(-1)

        xi0 = jnp.zeros(N * 6)
        J = jax.jacfwd(res)(xi0)                        # (6E, 6N)
        r = res(xi0)
        H = J.T @ J + damping * jnp.eye(N * 6)
        g = J.T @ r
        # gauge fix: pin pose 0 by zeroing its increment rows/cols
        fix = jnp.arange(N * 6) < 6
        H = jnp.where(fix[:, None] | fix[None, :],
                      jnp.where(jnp.eye(N * 6, dtype=bool), 1.0, 0.0), H)
        g = jnp.where(fix, 0.0, g)
        delta = -jnp.linalg.solve(H, g)
        Ts = jax.vmap(exp_se3)(delta.reshape(N, 6))
        return jnp.einsum("nij,njk->nik", poses_cur, Ts), None

    poses, _ = jax.lax.scan(body, poses, None, length=iters)
    return poses


@dataclasses.dataclass
class PoseGraph:
    """Append-only keyframe pose graph (host state, SURVEY.md §5.4)."""
    poses: List[np.ndarray] = dataclasses.field(default_factory=list)
    edges: List[Tuple[int, int, np.ndarray, float]] = dataclasses.field(default_factory=list)

    def add_keyframe(self, pose_world: np.ndarray) -> int:
        self.poses.append(np.asarray(pose_world, np.float32))
        return len(self.poses) - 1

    def add_edge(self, i: int, j: int, T_ij: np.ndarray, weight: float = 1.0):
        self.edges.append((i, j, np.asarray(T_ij, np.float32), float(weight)))

    def optimize(self, iters: int = 10) -> np.ndarray:
        if len(self.poses) < 2 or not self.edges:
            return np.stack(self.poses) if self.poses else np.zeros((0, 4, 4))
        poses = jnp.asarray(np.stack(self.poses))
        ij = jnp.asarray(np.array([[e[0], e[1]] for e in self.edges], np.int32))
        Ts = jnp.asarray(np.stack([e[2] for e in self.edges]))
        w = jnp.asarray(np.array([e[3] for e in self.edges], np.float32))
        out = np.asarray(optimize_poses(poses, ij, Ts, w, iters=iters))
        self.poses = [out[k] for k in range(out.shape[0])]
        return out

    # --- checkpoint / resume (SURVEY.md §5.4) ---------------------------
    def save(self, path: str, extra: dict | None = None) -> None:
        # atomic write (tmp + rename): a process killed mid-save
        # (SURVEY.md §5.3 fault injection) must never leave a truncated
        # checkpoint behind — the previous one stays intact
        import os
        if not path.endswith(".npz"):
            path = path + ".npz"
        tmp = path + ".tmp.npz"
        np.savez(tmp,
                 poses=np.stack(self.poses) if self.poses else np.zeros((0, 4, 4)),
                 edge_ij=np.array([[e[0], e[1]] for e in self.edges], np.int32).reshape(-1, 2),
                 edge_T=np.stack([e[2] for e in self.edges]) if self.edges else np.zeros((0, 4, 4)),
                 edge_w=np.array([e[3] for e in self.edges], np.float32),
                 **(extra or {}))
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> Tuple["PoseGraph", dict]:
        z = np.load(path, allow_pickle=False)
        g = cls()
        g.poses = [p for p in z["poses"]]
        g.edges = [(int(ij[0]), int(ij[1]), T, float(w))
                   for ij, T, w in zip(z["edge_ij"], z["edge_T"], z["edge_w"])]
        extra = {k: z[k] for k in z.files
                 if k not in ("poses", "edge_ij", "edge_T", "edge_w")}
        return g, extra
