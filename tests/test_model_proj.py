"""Projection-aware model tests: shapes, masking sanity, grads, iter variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2pnet_tpu.config import I2PNetProjConfig
from i2pnet_tpu.models import I2PNetProj


def _inputs(cfg, B=2, N=512, h=64, w=128, seed=0):
    rng = np.random.default_rng(seed)
    rgb = jnp.asarray(rng.normal(size=(B, h, w, 3)).astype(np.float32))
    raw = rng.normal(size=(B, N, 3)).astype(np.float32) * 10
    # zero-pad a chunk of points (large-range loader pads to 150k)
    raw[:, N // 2 :] = 0.0
    raw_xyz = jnp.asarray(raw)
    # decalibrated cloud: rotate+translate the raw one
    ang = 0.2
    q = jnp.asarray([[np.cos(ang / 2), 0, np.sin(ang / 2), 0]] * B, dtype=jnp.float32)
    from i2pnet_tpu.ops import quaternion as Q

    lidar = Q.warp_points(raw_xyz, q, jnp.asarray([[1.0, 0, 0.5]] * B))
    lidar = lidar * (jnp.sum(raw_xyz**2, -1, keepdims=True) > 0)
    intrinsic = jnp.tile(
        jnp.asarray([[[64.0, 0, 64], [0, 64.0, 32], [0, 0, 1]]], jnp.float32),
        (B, 1, 1),
    )
    return rgb, lidar, raw_xyz, intrinsic


@pytest.fixture(scope="module")
def proj_setup():
    cfg = I2PNetProjConfig.tiny()
    model = I2PNetProj(cfg)
    inputs = _inputs(cfg)
    variables = model.init(jax.random.key(0), *inputs, train=False)
    return cfg, model, variables, inputs


def test_proj_forward_shapes(proj_setup):
    cfg, model, variables, inputs = proj_setup
    out = model.apply(variables, *inputs, train=False)
    B = inputs[0].shape[0]
    assert out["out3"].shape == (B, 7)
    assert out["out4"].shape == (B, 7)
    for k in ("out3", "out4"):
        assert bool(jnp.isfinite(out[k]).all()), k
        qn = np.linalg.norm(np.asarray(out[k][:, :4]), axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-4)


def test_proj_grads_finite(proj_setup):
    cfg, model, variables, inputs = proj_setup
    params = variables["params"]

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            *inputs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return jnp.sum(out["out3"] ** 2) + jnp.sum(out["out4"] ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0.0


def test_proj_no_batch_stats(proj_setup):
    """Projection path uses stateless BN everywhere except the RGB encoder
    (track_running_stats=False, ref PPBackbone_center.py:30)."""
    cfg, model, variables, inputs = proj_setup
    stats = variables.get("batch_stats", {})
    keys = jax.tree_util.tree_leaves_with_path(stats)
    for path, _ in keys:
        assert "rgb_encoder" in jax.tree_util.keystr(path)


def test_proj_iter_variant(proj_setup):
    cfg, _, variables, inputs = proj_setup
    import dataclasses

    cfg6 = dataclasses.replace(cfg, refine_iters=3)
    model6 = I2PNetProj(cfg6)
    out = model6.apply(variables, *inputs, train=False)  # shared weights
    assert out["out3"].shape == (inputs[0].shape[0], 7)
    assert bool(jnp.isfinite(out["out3"]).all())


def test_proj_backbone_dist_mode():
    """PPBackbone_dist parity surface: distance-only features."""
    import jax
    from i2pnet_tpu.nn.proj_backbone import ProjectPointNet

    rng = np.random.default_rng(5)
    xyz = jnp.asarray(rng.normal(size=(1, 8, 16, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(1, 8, 16, 4)).astype(np.float32))
    m = ProjectPointNet(out_h=4, out_w=8, stride_h=2, stride_w=2,
                        kernel_size=(3, 3), nsample=4, distance=10.0,
                        mlp=(8,))
    v = m.init(jax.random.key(0), xyz, xyz, feat, dist_mode=True)
    _, _, out = m.apply(v, xyz, xyz, feat, dist_mode=True)
    assert out.shape == (1, 4, 8, 8)
    # dist-mode input is 1 channel -> first Dense kernel has in-dim 1
    k = v["params"]["mlp_convs"]["PointwiseConv_0"]["Dense_0"]["kernel"]
    assert k.shape[0] == 1


def test_pose_head_with_mlps_and_pos_embed():
    """Cover the global-attention PoseHead branch (mlp1/mlp2 nonempty,
    ref MainModules.py:330-370) and pos_embed."""
    import jax
    from i2pnet_tpu.nn.heads import PoseHead

    rng = np.random.default_rng(6)
    B, N, C = 2, 32, 16
    pred = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    mask = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(B, N, 8)).astype(np.float32))
    # weight * prediction requires mlp2[-1] == prediction channels
    # (as in the reference's commented full config, MainModules.py:64-65)
    head = PoseHead(mlp1=(16, 16), mlp2=(16,), hidden=16, pos_embed=True)
    v = head.init(jax.random.key(0), pred, mask, xyz, feat, None)
    q, t, mask_p = head.apply(v, pred, mask, xyz, feat, None)
    assert q.shape == (B, 4) and t.shape == (B, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0,
                               atol=1e-4)
    # projection-mask gating path
    pm = jax.nn.one_hot(jnp.ones((B, N), jnp.int32), 2)
    q2, t2, _ = head.apply(v, pred, mask, xyz, feat, pm)
    assert bool(jnp.isfinite(q2).all())
