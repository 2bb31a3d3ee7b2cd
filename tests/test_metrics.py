"""Tests for eval metrics and SE(3) Lie ops."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from i2pnet_tpu import metrics as M
from i2pnet_tpu.ops import se3 as lie


def _rand_extrinsic(rng, B):
    R = Rotation.random(B, random_state=rng).as_matrix()
    t = np.random.default_rng(0).normal(size=(B, 3, 1))
    return np.concatenate([R, t], axis=-1)


def test_mult_inv_extrinsic_roundtrip():
    rng = np.random.RandomState(0)
    E = _rand_extrinsic(rng, 4)
    I = M.mult_extrinsic_batch(M.inv_extrinsic(E), E)
    want = np.tile(np.eye(3, 4)[None], (4, 1, 1))
    np.testing.assert_allclose(I, want, atol=1e-8)


def test_rte_rre_zero_for_equal():
    rng = np.random.RandomState(1)
    E = _rand_extrinsic(rng, 4)
    rre, rte = M.rte_rre(E, E)
    np.testing.assert_allclose(rre, 0, atol=1e-5)
    np.testing.assert_allclose(rte, 0, atol=1e-8)


def test_rte_matches_translation_norm():
    B = 3
    E1 = np.tile(np.eye(3, 4)[None], (B, 1, 1))
    E2 = E1.copy()
    E2[:, :, 3] = [[1, 0, 0], [0, 2, 0], [0, 0, 3]]
    rre, rte = M.rte_rre(E1, E2)
    np.testing.assert_allclose(rte, [1, 2, 3], atol=1e-8)
    np.testing.assert_allclose(rre, 0, atol=1e-6)


def test_rre_yaw_only():
    B = 1
    E1 = np.tile(np.eye(3, 4)[None], (B, 1, 1))
    E2 = E1.copy()
    ang = np.deg2rad(5.0)
    E2[0, :3, :3] = Rotation.from_euler("y", ang).as_matrix()
    rre, rte = M.rte_rre(E1, E2)
    np.testing.assert_allclose(rre, [5.0], atol=1e-5)


def test_recall_thresholding():
    ev = M.RteRreEval(threshold=True, rre_th=10.0, rte_th=5.0)
    E1 = np.tile(np.eye(3, 4)[None], (2, 1, 1))
    E2 = E1.copy()
    E2[0, :, 3] = [1, 0, 0]  # within threshold
    E2[1, :, 3] = [50, 0, 0]  # beyond rte threshold
    ev.add_batch(E1, E2)
    assert ev.get_recall() == 0.5
    rte_m, _, rre_m, _ = ev.eval_seq()
    np.testing.assert_allclose(rte_m, 1.0, atol=1e-8)


def test_calibration_error_axes():
    E1 = np.tile(np.eye(3, 4)[None], (1, 1, 1))
    E2 = E1.copy()
    E2[0, :, 3] = [0.1, 0.2, 0.3]
    r, p, y, x, yy, z = M.calibration_error_batch(E1, E2)
    np.testing.assert_allclose([x[0], yy[0], z[0]], [0.1, 0.2, 0.3], atol=1e-8)


# ---- SE(3) Lie ops ----------------------------------------------------------


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(16, 3)).astype(np.float64)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, (16, 1))
    R = np.asarray(lie.so3_exp(jnp.array(w)))
    w2 = np.asarray(lie.so3_log(jnp.array(R)))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_exp_matches_scipy():
    rng = np.random.default_rng(3)
    w = rng.normal(size=(8, 3))
    R = np.asarray(lie.so3_exp(jnp.array(w)))
    want = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, want, atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    xi = rng.normal(size=(8, 6)) * 0.5
    T = np.asarray(lie.se3_exp(jnp.array(xi)))
    xi2 = np.asarray(lie.se3_log(jnp.array(T)))
    np.testing.assert_allclose(xi2, xi, atol=1e-5)


def test_se3_geodesic_sq_dist_properties():
    rng = np.random.default_rng(5)
    xi = rng.normal(size=(4, 6)) * 0.3
    d0 = np.asarray(lie.se3_geodesic_sq_dist(jnp.array(xi), jnp.array(xi)))
    np.testing.assert_allclose(d0, 0, atol=1e-8)
    # pure translation difference: squared distance == ||dt||^2
    a = np.zeros((1, 6))
    b = np.zeros((1, 6))
    b[0, 3:] = [1.0, 2.0, 2.0]
    d = np.asarray(lie.se3_geodesic_sq_dist(jnp.array(a), jnp.array(b)))
    np.testing.assert_allclose(d, [9.0], atol=1e-6)


def test_msee_reference_case():
    """Numeric check mirroring ref MSEE.py:29-73 __main__ (two hard poses)."""
    pred = np.eye(4)
    pred[:3, :4] = np.array(
        "0.999991599 0.004115324 0.000166180 3.741627481 -0.000066176 0.056396619 "
        "-0.998408417 -0.293070543 -0.004118170 0.998400045 0.056396417 -8.945714455".split()
    ).astype(np.float64).reshape(3, 4)
    gt = np.eye(4)
    gt[:3, :4] = np.array(
        "0.999855358 0.015505301 -0.006985343 -0.133210091 -0.007872897 0.057939322 "
        "-0.998289078 -0.449764716 -0.015074048 0.998199657 0.058053011 -9.358668589".split()
    ).astype(np.float64).reshape(3, 4)
    pred_se3 = M.extrinsic_to_se3(pred[None, :3, :])
    gt_se3 = M.extrinsic_to_se3(gt[None, :3, :])
    d = np.asarray(lie.se3_geodesic_sq_dist(jnp.array(pred_se3), jnp.array(gt_se3)))
    # direct check: distance equals ||log(T_pred^-1 T_gt)||^2
    T_rel = np.linalg.inv(pred) @ gt
    want = float(np.sum(np.asarray(lie.se3_log(jnp.array(T_rel[None]))) ** 2))
    np.testing.assert_allclose(d[0], want, rtol=1e-5)
    assert d[0] > 0


def test_eval_mrr_perfect_prediction():
    rng = np.random.default_rng(6)
    gt_se3 = rng.normal(size=(4, 6)) * 0.3
    pred_E = np.asarray(lie.se3_exp(jnp.array(gt_se3)))[:, :3, :]
    # quat from rotmat
    q = Rotation.from_matrix(pred_E[:, :3, :3]).as_quat()[:, [3, 0, 1, 2]]
    out3 = np.concatenate([q, pred_E[:, :3, 3]], axis=-1)
    msee = M.eval_msee(out3, gt_se3)
    np.testing.assert_allclose(msee, 0, atol=1e-6)
    mrr = M.eval_mrr(msee, gt_se3)
    np.testing.assert_allclose(mrr, 1.0, atol=1e-5)


def test_quaternion_distance():
    q = np.array([[1.0, 0, 0, 0]])
    ang = np.deg2rad(30)
    r = np.array([[np.cos(ang / 2), np.sin(ang / 2), 0, 0]])
    d = M.quaternion_distance(q, r)
    np.testing.assert_allclose(d, [ang], atol=1e-6)


def test_visualization_render():
    from i2pnet_tpu.eval.visualize import render_comparison, render_projection

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 255, size=(64, 128, 3), dtype=np.uint8)
    pts = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    pts[:, 2] += 10
    E = np.eye(3, 4, dtype=np.float32)
    K = np.array([[60.0, 0, 64], [0, 60.0, 32], [0, 0, 1]], np.float32)
    img = render_projection(rgb, pts, E, K)
    assert img.shape == rgb.shape
    assert not np.array_equal(img, rgb)  # some points drawn
    panel = render_comparison(rgb, pts, E, E, E, K)
    assert panel.shape == (192, 128, 3)


def test_average_meter():
    from i2pnet_tpu.utils import AverageMeter

    m = AverageMeter()
    m.update(1.0)
    m.update(3.0, n=3)
    assert m.avg == 2.5 and m.count == 4


def test_get_extrinsic_rt_matches_quat_path():
    rng = np.random.default_rng(9)
    q = Rotation.random(3, random_state=1).as_quat()[:, [3, 0, 1, 2]]
    t = rng.normal(size=(3, 3))
    init_E = np.tile(np.eye(3, 4)[None], (3, 1, 1))
    out3 = np.concatenate([q, t], axis=-1)
    pe1, ge1 = M.get_extrinsic(out3, q, t, init_E)
    R = M.quat_to_rotmat_batch(q.astype(np.float64))
    pe2, ge2 = M.get_extrinsic_rt(R, t, q, t, init_E)
    np.testing.assert_allclose(pe1, pe2, atol=1e-6)
    np.testing.assert_allclose(ge1, ge2, atol=1e-6)
