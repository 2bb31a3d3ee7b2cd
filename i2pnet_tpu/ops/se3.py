"""SO(3)/SE(3) exp/log maps, pure jnp.

Replaces the reference's vendored liegroups + geomstats stack
(/root/reference/src/util/lie_metric/: ~3.2k LoC) with ~140 lines used by the
MSEE/MRR metrics (ref src/util/lie_metric/MSEE.py:8-26).

se3 vectors are ordered (rotation(3), translation(3)) — the reference's
SE3_to_se3 reorders liegroups' (trans, rot) into this convention
(ref MSEE.py:8-15).

Numerics note: TPU matmuls default to bf16, which destroys these small
3x3 computations. W^2 is therefore built elementwise (w w^T - |w|^2 I, VPU
only) and the few remaining matmuls force Precision.HIGHEST.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_HI = jax.lax.Precision.HIGHEST


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], -1),
            jnp.stack([wz, zeros, -wx], -1),
            jnp.stack([-wy, wx, zeros], -1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _hat_sq(w: jnp.ndarray) -> jnp.ndarray:
    """hat(w) @ hat(w) == w w^T - |w|^2 I, computed elementwise (exact)."""
    outer = w[..., :, None] * w[..., None, :]
    norm_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    return outer - norm_sq * eye


def _theta(w: jnp.ndarray) -> jnp.ndarray:
    """|w| with shape (..., 1, 1) for matrix broadcasting."""
    return jnp.sqrt(jnp.sum(w * w, axis=-1))[..., None, None]


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues. w: (..., 3) -> R (..., 3, 3)."""
    theta = _theta(w)
    W = hat(w)
    W2 = _hat_sq(w)
    small = theta < 1e-5
    safe = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 1.0 - theta**2 / 6.0, jnp.sin(theta) / safe)
    B = jnp.where(small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(theta)) / safe**2)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + A * W + B * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """R (..., 3, 3) -> w (..., 3). Stable away from theta == pi."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)[..., None]
    small = theta < 1e-5
    factor = jnp.where(
        small,
        0.5 + theta**2 / 12.0,
        theta / (2.0 * jnp.sin(jnp.where(small, 1.0, theta))),
    )
    w = factor * vee(R - jnp.swapaxes(R, -1, -2))
    # near pi the antisymmetric part vanishes; use the diagonal construction
    near_pi = theta[..., 0] > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis_sq = jnp.clip(
        (diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0, None
    )
    axis = jnp.sqrt(axis_sq)
    sign_x = jnp.where(R[..., 2, 1] - R[..., 1, 2] >= 0, 1.0, -1.0)
    sign_y = jnp.where(R[..., 0, 2] - R[..., 2, 0] >= 0, 1.0, -1.0)
    sign_z = jnp.where(R[..., 1, 0] - R[..., 0, 1] >= 0, 1.0, -1.0)
    axis = axis * jnp.stack([sign_x, sign_y, sign_z], -1)
    w_pi = axis * theta[..., 0][..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def _left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    theta = _theta(w)
    W = hat(w)
    W2 = _hat_sq(w)
    small = theta < 1e-5
    safe = jnp.where(small, 1.0, theta)
    B = jnp.where(small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(theta)) / safe**2)
    C = jnp.where(
        small, 1.0 / 6.0 - theta**2 / 120.0, (theta - jnp.sin(theta)) / safe**3
    )
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + B * W + C * W2


def _left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta = _theta(w)
    W = hat(w)
    W2 = _hat_sq(w)
    small = theta < 1e-5
    safe = jnp.where(small, 1.0, theta)
    half = theta / 2.0
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta**2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half)))
        / safe**2,
    )
    eye = jnp.eye(3, dtype=w.dtype)
    return eye - 0.5 * W + coef * W2


def _matvec(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", M, v, precision=_HI)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """xi (..., 6) = (rot, trans) -> T (..., 4, 4)."""
    w, rho = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    t = _matvec(_left_jacobian(w), rho)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """T (..., 4, 4) -> xi (..., 6) = (rot, trans)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    rho = _matvec(_left_jacobian_inv(w), t)
    return jnp.concatenate([w, rho], axis=-1)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -_matvec(Rt, t)
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_geodesic_sq_dist(xi_a: jnp.ndarray, xi_b: jnp.ndarray) -> jnp.ndarray:
    """Squared left-canonical geodesic distance between se3 coordinates.

    ||log(exp(xi_a)^-1 exp(xi_b))||^2 — the quantity behind the reference's
    geomstats left_canonical_metric loss (ref MSEE.py:17-26 cal_metric).
    """
    Ta, Tb = se3_exp(xi_a), se3_exp(xi_b)
    rel = jnp.einsum("...ij,...jk->...ik", se3_inverse(Ta), Tb, precision=_HI)
    diff = se3_log(rel)
    return jnp.sum(diff * diff, axis=-1)
