"""Factored image->lidar max response (all-pixels cost volumes).

With nsample_q == -1 the backward-validation correlation max over the
point axis factorizes — qi_norm is constant over n and pi_norm over k, so
max_n(pi*qi) = qi>=0 ? qi*max_n(pi) : qi*min_n(pi) — removing the
(B,N,K,C) correlation materialization + reduction
(ref MainModules.py:178-190 computes the dense max).  These tests pin
forward equality (the winning product is the same fp multiply) and
gradient equality against the dense form for BOTH families' modules.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2pnet_tpu.nn.costvolume import CostVolume
from i2pnet_tpu.nn.proj_backbone import ProjCostVolume


def _free_inputs(seed, B=2, N=24, K=40, C=16):
    rng = np.random.default_rng(seed)
    warped_xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    warped_points = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    f2_xyz = jnp.asarray(rng.normal(size=(B, K, 3)).astype(np.float32))
    f2_points = jnp.asarray(rng.normal(size=(B, K, C)).astype(np.float32))
    lidar_z = jnp.asarray(
        rng.uniform(1, 5, size=(B, N, 1)).astype(np.float32))
    return warped_xyz, warped_points, f2_xyz, f2_points, lidar_z


@pytest.mark.parametrize("corr_func", ["elementwise_product", "cosine"])
def test_costvolume_factored_respond_matches_dense(monkeypatch, corr_func):
    inputs = _free_inputs(0)
    mod = CostVolume(
        nsample=4, nsample_q=-1, mlp1=(16, 16), mlp2=(16, 16),
        corr_func=corr_func, backward_validation=True,
    )
    monkeypatch.setenv("I2PNET_CV_FACTORED_RESPOND", "0")
    variables = mod.init(jax.random.PRNGKey(0), *inputs)

    def loss(params, warped_points, f2_points, env):
        monkeypatch.setenv("I2PNET_CV_FACTORED_RESPOND", env)
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            inputs[0], warped_points, inputs[2], f2_points, inputs[4],
            train=True, mutable=["batch_stats"])
        return jnp.sum(out * out)

    args = (variables["params"], inputs[1], inputs[3])
    ref_l, ref_g = jax.value_and_grad(
        lambda p, w, f: loss(p, w, f, "0"), argnums=(0, 1, 2))(*args)
    new_l, new_g = jax.value_and_grad(
        lambda p, w, f: loss(p, w, f, "1"), argnums=(0, 1, 2))(*args)

    np.testing.assert_allclose(float(new_l), float(ref_l), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(new_g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_proj_costvolume_factored_respond_matches_dense(monkeypatch):
    rng = np.random.default_rng(3)
    B, H, W, K, C = 2, 4, 8, 30, 16
    N = H * W
    xyz_raw = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    warped_xyz = jnp.asarray(
        rng.normal(size=(B, N, 3)).astype(np.float32))
    # some invalid (zero) centers so the valid-mask path is exercised
    mask = rng.random((B, N)) < 0.3
    warped_xyz = jnp.where(jnp.asarray(mask)[..., None], 0.0, warped_xyz)
    warped_points = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    idx_n2 = jnp.zeros((B, N, 2), jnp.int32)
    f2_xyz = jnp.asarray(rng.normal(size=(B, K, 3)).astype(np.float32))
    f2_points = jnp.asarray(rng.normal(size=(B, K, C)).astype(np.float32))
    lidar_z = jnp.asarray(rng.uniform(1, 5, size=(B, N, 1)).astype(np.float32))

    mod = ProjCostVolume(
        H=H, W=W, kernel_size=(3, 3), distance=10.0, nsample=4, nsample_q=-1,
        mlp1=(16, 16), mlp2=(16, 16), backward_validation=True,
    )
    monkeypatch.setenv("I2PNET_CV_FACTORED_RESPOND", "0")
    variables = mod.init(
        jax.random.PRNGKey(0), xyz_raw, warped_xyz, warped_points, idx_n2,
        f2_xyz, f2_points, lidar_z)

    def loss(params, warped_points, f2_points, env):
        monkeypatch.setenv("I2PNET_CV_FACTORED_RESPOND", env)
        out = mod.apply(
            {"params": params}, xyz_raw, warped_xyz, warped_points, idx_n2,
            f2_xyz, f2_points, lidar_z, train=True)
        return jnp.sum(out * out)

    args = (variables["params"], warped_points, f2_points)
    ref_l, ref_g = jax.value_and_grad(
        lambda p, w, f: loss(p, w, f, "0"), argnums=(0, 1, 2))(*args)
    new_l, new_g = jax.value_and_grad(
        lambda p, w, f: loss(p, w, f, "1"), argnums=(0, 1, 2))(*args)

    np.testing.assert_allclose(float(new_l), float(ref_l), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(new_g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
