"""Dense (all-candidate, multiplicity-weighted) PointNet reformulation
(ops/dense_window.py) vs the shipped gather-shaped ProjectPointNet.

Same real-number semantics; fp differences only from BN-statistic
reduction order. Ref semantics: PPBackbone_center.py:54-199.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2pnet_tpu.nn.proj_backbone import ProjectPointNet
from i2pnet_tpu.ops.dense_window import (
    dense_pointnet_eval,
    selection_multiplicity,
)
from i2pnet_tpu.ops.projection import window_neighbor_select_grid


def _grids(seed, B=2, H=8, W=16, C=3, holes=0.3):
    rng = np.random.default_rng(seed)
    xyz_raw = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    mask = rng.random((B, H, W)) < holes
    xyz_raw[mask] = 0.0
    xyz = xyz_raw + rng.normal(size=(B, H, W, 3)).astype(np.float32) * 0.05
    xyz[mask] = 0.0
    feat = rng.normal(size=(B, H, W, C)).astype(np.float32)
    return jnp.asarray(xyz_raw), jnp.asarray(xyz), jnp.asarray(feat)


def test_selection_multiplicity_sums_to_k():
    xyz_raw, xyz, _ = _grids(0)
    K, kernel = 4, (3, 5)
    args, _ = window_neighbor_select_grid(
        xyz, xyz, 4, 8, (2, 2), kernel, K, stride=(1, 1), distance=1.5,
        shift=True, copy=True,
    )
    m = selection_multiplicity(args, kernel[0] * kernel[1])
    np.testing.assert_array_equal(np.asarray(m.sum(-1)), K)


@pytest.mark.parametrize("center_mode,using_intens,dtype", [
    (True, False, None),
    (True, True, jnp.bfloat16),
    (False, False, None),
])
def test_dense_pointnet_matches_module(center_mode, using_intens, dtype):
    xyz_raw, xyz, feat = _grids(1)
    kw = dict(
        out_h=4, out_w=8, stride_h=2, stride_w=2, kernel_size=(3, 5),
        nsample=4, distance=1.5, mlp=(8, 16),
    )
    mod = ProjectPointNet(use_trans=True, use_bn=True, dtype=dtype, **kw)
    variables = mod.init(
        jax.random.PRNGKey(0), xyz_raw, xyz, feat,
        center_mode=center_mode, using_intens=using_intens,
    )
    # non-trivial BN affine so a stats mismatch is visible
    variables = jax.tree_util.tree_map(
        lambda t: t + 0.1 * jnp.arange(t.size, dtype=t.dtype).reshape(t.shape)
        / t.size, variables)
    pr_r, pr_w, ref = mod.apply(
        variables, xyz_raw, xyz, feat,
        center_mode=center_mode, using_intens=using_intens,
    )
    dn_r, dn_w, out = dense_pointnet_eval(
        xyz_raw, xyz, feat, variables["params"],
        center_mode=center_mode, using_intens=using_intens,
        use_trans=True, dtype=dtype, **kw,
    )
    np.testing.assert_array_equal(np.asarray(pr_r), np.asarray(dn_r))
    np.testing.assert_array_equal(np.asarray(pr_w), np.asarray(dn_w))
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32),
        rtol=tol, atol=tol,
    )


@pytest.mark.parametrize("out_hw,qstride,kernel,K,distance", [
    ((4, 8), (2, 2), (3, 5), 4, 1.5),
    ((8, 16), (1, 1), (3, 3), 4, 1.0),
    ((2, 4), (4, 4), (5, 5), 8, 2.0),
    ((4, 8), (2, 2), (3, 3), 16, 1.5),   # K > khw: sentinel/copy fill
])
def test_selection_multiplicity_pallas_exact(out_hw, qstride, kernel, K,
                                             distance):
    """The Pallas K-pass extraction must reproduce top_k's selected
    multiset exactly (value order, lowest-index ties, copy fill,
    sentinel mass) on every query."""
    from i2pnet_tpu.ops.select_pallas import selection_multiplicity_pallas

    rng = np.random.default_rng(11)
    B, H, W = 2, 8, 16
    xyz = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    xyz[rng.random((B, H, W)) < 0.3] = 0.0
    # quantize to force distance ties (tie order must match top_k)
    xyz = np.round(xyz * 4) / 4
    xyz = jnp.asarray(xyz)
    out_h, out_w = out_hw
    khw = kernel[0] * kernel[1]
    args, _ = window_neighbor_select_grid(
        xyz, xyz, out_h, out_w, qstride, kernel, K, stride=(1, 1),
        distance=distance, shift=True, copy=True,
    )
    ref = selection_multiplicity(args, khw)
    got = selection_multiplicity_pallas(
        xyz, out_h=out_h, out_w=out_w, qstride=qstride,
        kernel_size=kernel, K=K, distance=distance, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("center_mode,using_intens,dtype", [
    (True, False, None),
    (True, False, jnp.bfloat16),
    (True, True, None),
    (False, False, None),
])
def test_fused_pointnet_matches_module(center_mode, using_intens, dtype):
    """dense_pointnet_fused (Pallas interpret) vs the gathered module:
    same params, matching outputs at BN-reduction-order tolerance."""
    from i2pnet_tpu.ops.pointnet_pallas import dense_pointnet_fused

    xyz_raw, xyz, feat = _grids(7)
    kw = dict(
        out_h=4, out_w=8, stride_h=2, stride_w=2, kernel_size=(3, 5),
        nsample=4, distance=1.5, mlp=(8, 16),
    )
    mod = ProjectPointNet(use_trans=True, use_bn=True, dtype=dtype, **kw)
    variables = mod.init(
        jax.random.PRNGKey(2), xyz_raw, xyz, feat,
        center_mode=center_mode, using_intens=using_intens,
    )
    variables = jax.tree_util.tree_map(
        lambda t: t + 0.1 * jnp.arange(t.size, dtype=t.dtype).reshape(t.shape)
        / t.size, variables)
    pr_r, pr_w, ref = mod.apply(
        variables, xyz_raw, xyz, feat,
        center_mode=center_mode, using_intens=using_intens,
    )
    fs_r, fs_w, out = dense_pointnet_fused(
        xyz_raw, xyz, feat, variables["params"],
        center_mode=center_mode, using_intens=using_intens,
        use_trans=True, dtype=dtype, interpret=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(pr_r), np.asarray(fs_r))
    np.testing.assert_array_equal(np.asarray(pr_w), np.asarray(fs_w))
    # bf16: the kernel's dot/bias rounding points match the native path,
    # but BN statistics accumulate in a different order over bf16-rounded
    # values — a handful of post-BN elements land ~1 bf16 ulp apart
    tol = 3e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32),
        rtol=tol, atol=tol,
    )


def test_dense_pn_routing_through_module(monkeypatch):
    """I2PNET_DENSE_PN=1 routes ProjectPointNet through the dense path
    with the SAME param tree and matching outputs (env read at trace)."""
    xyz_raw, xyz, feat = _grids(5)
    kw = dict(
        out_h=4, out_w=8, stride_h=2, stride_w=2, kernel_size=(3, 5),
        nsample=4, distance=1.5, mlp=(8, 16),
    )
    mod = ProjectPointNet(use_trans=True, use_bn=True, **kw)
    monkeypatch.setenv("I2PNET_DENSE_PN", "0")
    variables = mod.init(
        jax.random.PRNGKey(1), xyz_raw, xyz, feat, center_mode=True)
    _, _, ref = mod.apply(variables, xyz_raw, xyz, feat, center_mode=True)
    monkeypatch.setenv("I2PNET_DENSE_PN", "1")
    _, _, out = mod.apply(variables, xyz_raw, xyz, feat, center_mode=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)
    # mode 3 (fully fused, interpret off-TPU) through the module, eval only
    monkeypatch.setenv("I2PNET_DENSE_PN", "3")
    _, _, out3 = mod.apply(variables, xyz_raw, xyz, feat, center_mode=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out3), rtol=2e-5, atol=2e-5)

    # dense path (modes 1/2) must stay differentiable in train mode
    # (mode 2's pallas multiplicities are stop_gradient'ed)
    for mode in ("1", "2"):
        monkeypatch.setenv("I2PNET_DENSE_PN", mode)

        def loss(p):
            _, _, o = mod.apply(
                {"params": p}, xyz_raw, xyz, feat, center_mode=True,
                train=True)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(t))) for t in leaves)
        assert any(float(jnp.max(jnp.abs(t))) > 0 for t in leaves)
