"""Property tests for quaternion / SE(3) ops (ref: warp_utils.py semantics)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from i2pnet_tpu.ops import quaternion as Q


def random_unit_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return q.astype(np.float32)


def test_qmul_matches_scipy():
    rng = np.random.default_rng(0)
    qa = random_unit_quat(rng, (8,))
    qb = random_unit_quat(rng, (8,))
    got = np.asarray(Q.qmul(jnp.array(qa), jnp.array(qb)))
    # scipy uses (x,y,z,w)
    ra = Rotation.from_quat(qa[:, [1, 2, 3, 0]])
    rb = Rotation.from_quat(qb[:, [1, 2, 3, 0]])
    want_xyzw = (ra * rb).as_quat()
    want = want_xyzw[:, [3, 0, 1, 2]]
    # quaternion double cover: compare up to sign
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got * sign, want, atol=1e-5)


def test_qinv_is_inverse():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(8, 4)).astype(np.float32) * 2.0  # non-unit
    prod = np.asarray(Q.qmul(jnp.array(q), Q.qinv(jnp.array(q))))
    want = np.tile(np.array([1, 0, 0, 0], np.float32), (8, 1))
    np.testing.assert_allclose(prod, want, atol=1e-4)


def test_qrotate_matches_rotmat():
    rng = np.random.default_rng(2)
    q = random_unit_quat(rng, (4,))
    v = rng.normal(size=(4, 16, 3)).astype(np.float32)
    got = np.asarray(Q.qrotate(jnp.array(q)[:, None, :], jnp.array(v)))
    R = np.asarray(Q.quat_to_rotmat(jnp.array(q)))
    want = np.einsum("bij,bnj->bni", R, v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_to_rotmat_matches_scipy():
    rng = np.random.default_rng(3)
    q = random_unit_quat(rng, (16,))
    got = np.asarray(Q.quat_to_rotmat(jnp.array(q)))
    want = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotmat_to_quat_roundtrip():
    rng = np.random.default_rng(4)
    q = random_unit_quat(rng, (64,))
    # include near-degenerate cases (trace ~ -1)
    q[0] = [0, 1, 0, 0]
    q[1] = [0, 0, 1, 0]
    q[2] = [0, 0, 0, 1]
    q[3] = [1, 0, 0, 0]
    R = np.asarray(Q.quat_to_rotmat(jnp.array(q)))
    q2 = np.asarray(Q.rotmat_to_quat(jnp.array(R)))
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_warp_points_matches_matrix_transform():
    rng = np.random.default_rng(5)
    q = random_unit_quat(rng, (3,))
    t = rng.normal(size=(3, 3)).astype(np.float32)
    xyz = rng.normal(size=(3, 32, 3)).astype(np.float32)
    got = np.asarray(Q.warp_points(jnp.array(xyz), jnp.array(q), jnp.array(t)))
    R = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    want = np.einsum("bij,bnj->bni", R, xyz) + t[:, None, :]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_warp_to_normalized_plane():
    rng = np.random.default_rng(6)
    q = np.tile(np.array([1, 0, 0, 0], np.float32), (2, 1))
    t = np.zeros((2, 3), np.float32)
    xyz = rng.uniform(1.0, 5.0, size=(2, 8, 3)).astype(np.float32)
    uvw, z = Q.warp_to_normalized_plane(jnp.array(xyz), jnp.array(q), jnp.array(t))
    np.testing.assert_allclose(np.asarray(z)[..., 0], xyz[..., 2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(uvw)[..., 2], 1.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(uvw)[..., 0], xyz[..., 0] / xyz[..., 2], atol=1e-4, rtol=1e-4
    )


def test_compose_pose_matches_matrix_composition():
    """q = q3*q4, t = R3 t4 + t3 (ref modellearn.py:357-373)."""
    rng = np.random.default_rng(7)
    q3, q4 = random_unit_quat(rng, (5,)), random_unit_quat(rng, (5,))
    t3 = rng.normal(size=(5, 3)).astype(np.float32)
    t4 = rng.normal(size=(5, 3)).astype(np.float32)
    q, t = Q.compose_pose(jnp.array(q3), jnp.array(t3), jnp.array(q4), jnp.array(t4))
    R3 = Rotation.from_quat(q3[:, [1, 2, 3, 0]]).as_matrix()
    R4 = Rotation.from_quat(q4[:, [1, 2, 3, 0]]).as_matrix()
    want_R = np.einsum("bij,bjk->bik", R3, R4)
    got_R = np.asarray(Q.quat_to_rotmat(q))
    want_t = np.einsum("bij,bj->bi", R3, t4) + t3
    np.testing.assert_allclose(got_R, want_R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), want_t, atol=1e-5)


def test_warp_with_calib():
    """EFGH variant: calib @ (q p q' + t) then normalize (ref
    warp_utils.py:97-131)."""
    rng = np.random.default_rng(8)
    q = random_unit_quat(rng, (2,))
    t = rng.normal(size=(2, 3)).astype(np.float32)
    xyz = rng.uniform(1, 5, size=(2, 16, 3)).astype(np.float32)
    calib = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    calib[:, :3, 3] = [0.1, -0.2, 0.3]
    uvw, z = Q.warp_with_calib(jnp.array(xyz), jnp.array(q), jnp.array(t),
                               jnp.array(calib))
    R = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    cam = np.einsum("bij,bnj->bni", R, xyz) + t[:, None, :] + calib[:, None, :3, 3]
    np.testing.assert_allclose(np.asarray(z)[..., 0], cam[..., 2], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(uvw)[..., 0], cam[..., 0] / cam[..., 2], atol=1e-4, rtol=1e-4
    )
    uvw2, z2 = Q.project_with_calib(jnp.array(xyz), jnp.array(calib))
    np.testing.assert_allclose(
        np.asarray(z2)[..., 0], xyz[..., 2] + 0.3, atol=1e-5
    )
