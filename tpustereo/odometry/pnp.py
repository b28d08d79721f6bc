"""3D→2D pose refinement: Gauss–Newton on SE(3) with Huber IRLS weights
(SURVEY.md §4.4 `odometry.pnp_gn`). Fixed iteration count, fully jit-able.

Estimates T (previous-keyframe camera → current camera) minimising
Σ w‖π(T·X_i) − u_i‖² over matched (X_i, u_i); invalid matches carry w=0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpustereo.odometry.se3 import exp_se3


def project(P: jnp.ndarray, fx, fy, cx, cy):
    """(N, 3) camera points -> (N, 2) pixels."""
    z = jnp.maximum(P[:, 2], 1e-6)
    return jnp.stack([fx * P[:, 0] / z + cx, fy * P[:, 1] / z + cy], -1)


@partial(jax.jit, static_argnames=("iters",))
def gauss_newton_pose(X: jnp.ndarray, u: jnp.ndarray, w: jnp.ndarray,
                      intrinsics: jnp.ndarray, T0: jnp.ndarray | None = None,
                      iters: int = 10, huber: float = 3.0):
    """X (N,3) 3D pts in keyframe cam frame; u (N,2) pixels in current frame;
    w (N,) weights (0 = invalid); intrinsics [fx, fy, cx, cy].
    Returns (T (4,4), mean_weighted_residual)."""
    fx, fy, cx, cy = intrinsics
    N = X.shape[0]
    T = jnp.eye(4) if T0 is None else T0

    def body(T, _):
        R, t = T[:3, :3], T[:3, 3]
        P = X @ R.T + t                          # (N, 3) current-cam points
        z = jnp.maximum(P[:, 2], 1e-6)
        pred = jnp.stack([fx * P[:, 0] / z + cx, fy * P[:, 1] / z + cy], -1)
        r = pred - u                              # (N, 2)
        # Huber IRLS weight on the residual norm
        rn = jnp.linalg.norm(r, axis=-1)
        wh = jnp.where(rn > huber, huber / jnp.maximum(rn, 1e-9), 1.0) * w
        # Jacobian of reprojection wrt left-multiplied twist [rho, omega]
        x, y = P[:, 0], P[:, 1]
        zi = 1.0 / z
        zero = jnp.zeros(N)
        # d(pred)/dP
        JP_u = jnp.stack([fx * zi, zero, -fx * x * zi * zi], -1)   # (N, 3)
        JP_v = jnp.stack([zero, fy * zi, -fy * y * zi * zi], -1)
        # dP/dxi: [I | -hat(P)]
        def row(JP):
            Jr = JP                                               # rho part
            Jw = jnp.stack([
                JP[:, 1] * P[:, 2] - JP[:, 2] * P[:, 1],
                JP[:, 2] * P[:, 0] - JP[:, 0] * P[:, 2],
                JP[:, 0] * P[:, 1] - JP[:, 1] * P[:, 0],
            ], -1) * -1.0
            return jnp.concatenate([Jr, Jw], -1)                  # (N, 6)
        Ju, Jv = row(JP_u), row(JP_v)
        J = jnp.stack([Ju, Jv], 1)                                # (N, 2, 6)
        rw = wh[:, None, None]
        H = jnp.einsum("nki,nkj->ij", J * rw, J)
        g = jnp.einsum("nki,nk->i", J * rw, r)
        H = H + 1e-6 * jnp.eye(6)
        delta = -jnp.linalg.solve(H, g)
        return exp_se3(delta) @ T, None

    T, _ = jax.lax.scan(body, T, None, length=iters)
    # final residual for keyframe decisions / diagnostics
    R, t = T[:3, :3], T[:3, 3]
    P = X @ R.T + t
    pred = project(P, fx, fy, cx, cy)
    rn = jnp.linalg.norm(pred - u, axis=-1)
    wsum = jnp.maximum(w.sum(), 1e-6)
    return T, (rn * w).sum() / wsum
