"""SE(3) / SO(3) utilities in jnp (jit/grad-compatible) for the odometry
backend: hat maps, exponential/logarithm maps, composition. Small-angle
branches are handled with jnp.where on Taylor expansions so everything is
differentiable and branch-free (XLA-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _safe_theta(w):
    """(…, 3) -> (t2, theta) with theta = ||w|| computed so the derivative
    at w = 0 is finite (jnp.linalg.norm's jvp at 0 is NaN — this breaks
    jacfwd through exp/log at the identity, which is exactly where the
    pose-graph GN linearises). theta is clamped below at _EPS; callers'
    small-angle branches use t2 directly."""
    t2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(t2, _EPS * _EPS))
    return t2, theta


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) -> (…, 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (…, 3) -> (…, 3, 3)."""
    t2, theta = _safe_theta(w)
    K = hat(w)
    K2 = K @ K
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(theta > _EPS, jnp.sin(theta) / jnp.maximum(theta, _EPS),
                  1.0 - t2 / 6.0)
    b = jnp.where(theta > _EPS, (1.0 - jnp.cos(theta)) / jnp.maximum(t2, _EPS * _EPS),
                  0.5 - t2 / 24.0)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + a * K + b * K2


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) -> (…, 3)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    s = jnp.where(theta[..., None] > _EPS,
                  theta[..., None] / jnp.maximum(2.0 * jnp.sin(theta[..., None]), _EPS),
                  0.5 + theta[..., None] ** 2 / 12.0)
    return s * w


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent (…, 6) [rho, w] -> (…, 4, 4) homogeneous transform."""
    rho, w = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    t2, theta = _safe_theta(w)
    K = hat(w)
    K2 = K @ K
    b = jnp.where(theta > _EPS, (1.0 - jnp.cos(theta)) / jnp.maximum(t2, _EPS * _EPS),
                  0.5 - t2 / 24.0)
    c = jnp.where(theta > _EPS,
                  (theta - jnp.sin(theta)) / jnp.maximum(t2 * theta, _EPS ** 3),
                  1.0 / 6.0 - t2 / 120.0)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    V = eye + b * K + c * K2
    t = (V @ rho[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]),
                              top[..., :1, :].shape)
    return jnp.concatenate([top, bottom], -2)


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """(…, 4, 4) -> (…, 6) [rho, w]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = log_so3(R)
    t2, theta = _safe_theta(w)
    K = hat(w)
    K2 = K @ K
    # V^{-1} = I - K/2 + (1/t^2 - (1+cos)/(2 t sin)) K^2
    cot_term = jnp.where(
        theta > _EPS,
        1.0 / jnp.maximum(t2, _EPS * _EPS)
        - (1.0 + jnp.cos(theta)) / jnp.maximum(2.0 * theta * jnp.sin(theta), _EPS * _EPS),
        1.0 / 12.0 + t2 / 720.0)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    Vinv = eye - 0.5 * K + cot_term * K2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, w], -1)


def inv_se3(T: jnp.ndarray) -> jnp.ndarray:
    R, t = T[..., :3, :3], T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    top = jnp.concatenate([Rt, ti[..., None]], -1)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]),
                              top[..., :1, :].shape)
    return jnp.concatenate([top, bottom], -2)
