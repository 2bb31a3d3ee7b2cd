"""Quaternion / SE(3) algebra, pure jnp.

Capability parity with the reference's quaternion utilities
(/root/reference/src/modules/warp_utils.py: inv_q:10, mul_q:25, warp_quat:58,
warp_quat_xyz:78; /root/reference/compute_loss.py: qt2Ebatch:40) but written
vectorized / broadcast-first so everything stays on the VPU with no
per-element indexing.

Conventions: quaternions are (w, x, y, z), trailing axis of size 4.
All functions broadcast over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-10


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate. q: (..., 4)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qinv(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse conj(q)/|q|^2 (ref warp_utils.py:10-22 inv_q)."""
    norm_sq = jnp.sum(q * q, axis=-1, keepdims=True) + _EPS
    return qconj(q) / norm_sq


def qmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, broadcasting over leading axes.

    Mirrors ref warp_utils.py:25-55 mul_q but supports any leading shape.
    """
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def qrotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternion(s) q (..., 4): q [0,v] q^-1.

    Uses the full inverse (not conjugate) so non-unit q matches the
    reference's mul_q/inv_q composition exactly.
    """
    zeros = jnp.zeros(v.shape[:-1] + (1,), dtype=v.dtype)
    vq = jnp.concatenate([zeros, v], axis=-1)
    out = qmul(qmul(q, vq), qinv(q))
    return out[..., 1:4]


def warp_points(xyz: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) given by (q, t) to points.

    xyz: (B, N, 3); q: (B, 4); t: (B, 3). Returns (B, N, 3).
    Equivalent to ref warp_utils.py:78-94 warp_quat_xyz (which takes t as a
    [0, t] 4-vector).
    """
    rotated = qrotate(q[:, None, :], xyz)
    return rotated + t[:, None, :]


def warp_to_normalized_plane(
    xyz: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Warp points by (q, t) then project to the normalized camera plane.

    Returns (uvw, z): uvw (B, N, 3) with uvw[..., 2] == 1 (up to eps), and
    the depth z (B, N, 1). Equivalent to ref warp_utils.py:58-76 warp_quat.
    """
    warped = warp_points(xyz, q, t)
    z = warped[..., 2:3]
    uvw = warped / (z + _EPS)
    return uvw, z


def project_to_normalized_plane(
    xyz: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Divide camera-frame points by depth (ref warp_utils.py:148-156)."""
    z = xyz[..., 2:3]
    return xyz / (z + _EPS), z


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3).

    Same expansion as ref compute_loss.py:136-155 quat2R / metric.py:9-34.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * y**2 - 2 * z**2,
            2 * x * y - 2 * z * w,
            2 * x * z + 2 * y * w,
            2 * x * y + 2 * z * w,
            1 - 2 * x**2 - 2 * z**2,
            2 * y * z - 2 * x * w,
            2 * x * z - 2 * y * w,
            2 * y * z + 2 * x * w,
            1 - 2 * x**2 - 2 * y**2,
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free Shepperd-style selection (jnp.where over the four candidate
    constructions) so it jits with no data-dependent control flow.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Candidate 0: trace-dominant
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    # Candidate 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    # Candidate 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    # Candidate 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.sign(jnp.where(q[..., 0:1] == 0, 1.0, q[..., 0:1]))


def compose_pose(
    q_outer: jnp.ndarray,
    t_outer: jnp.ndarray,
    q_inner: jnp.ndarray,
    t_inner: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compose two SE(3) corrections: result = outer o inner.

    q = q_o * q_i ; t = R_o @ t_i + t_o. This is the coarse-to-fine
    composition at ref modellearn.py:357-373 (q3, t3 refine q4, t4).
    All args (B, 4)/(B, 3); returns ((B, 4), (B, 3)).
    """
    q = qmul(q_outer, q_inner)
    t = qrotate(q_outer[:, None, :], t_inner[:, None, :])[:, 0, :] + t_outer
    return q, t


def pose_to_matrix(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(q (B,4), t (B,3)) -> extrinsic (B, 3, 4) (ref compute_loss.py:40-63)."""
    R = quat_to_rotmat(q)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def warp_with_calib(
    xyz: jnp.ndarray,
    q: jnp.ndarray,
    t: jnp.ndarray,
    calib: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Warp by (q, t), then project through a (B, 3or4, 4) calib matrix to
    the normalized plane (ref warp_utils.py:97-131 warp_quat_EFGH:
    calib @ (q p q' + t) then divide by z).

    HIGHEST: TPU matmuls default to bf16; a bf16 calib product would shift
    projected pixel coordinates by ~0.4% relative (CLAUDE.md rule), moving
    cost-volume neighbor sets off the CPU-verified geometry."""
    import jax

    warped = warp_points(xyz, q, t)
    cam = jnp.einsum(
        "bij,bnj->bni", calib[:, :3, :3], warped,
        precision=jax.lax.Precision.HIGHEST,
    ) + calib[:, None, :3, 3]
    z = cam[..., 2:3]
    return cam / (z + _EPS), z


def project_with_calib(
    xyz: jnp.ndarray, calib: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project through a calib matrix without a warp
    (ref warp_utils.py:133-146 projection_initial_EFGH).

    HIGHEST: same bf16-matmul-precision rationale as warp_with_calib."""
    import jax

    cam = jnp.einsum(
        "bij,bnj->bni", calib[:, :3, :3], xyz,
        precision=jax.lax.Precision.HIGHEST,
    ) + calib[:, None, :3, 3]
    z = cam[..., 2:3]
    return cam / (z + _EPS), z
