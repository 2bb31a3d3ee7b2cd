"""Model forward tests: shapes, jit/eager parity, grad flow, unit quaternion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2pnet_tpu.config import I2PNetConfig
from i2pnet_tpu.models import I2PNet


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    rng = np.random.default_rng(0)
    B = 2
    rgb = jnp.array(rng.normal(size=(B, 64, 128, 3)).astype(np.float32))
    lidar = jnp.array(
        rng.uniform(-5, 5, size=(B, cfg.lidar_in_points, 3)).astype(np.float32)
    )
    lidar = lidar.at[..., 2].add(10.0)  # in front of camera
    intrinsic = jnp.tile(
        jnp.array([[[50.0, 0, 64], [0, 50.0, 32], [0, 0, 1]]], jnp.float32),
        (B, 1, 1),
    )
    variables = model.init(jax.random.key(0), rgb, lidar, intrinsic, train=False)
    return cfg, model, variables, (rgb, lidar, intrinsic)


def test_forward_shapes(tiny_setup):
    cfg, model, variables, (rgb, lidar, intrinsic) = tiny_setup
    out = model.apply(variables, rgb, lidar, intrinsic, train=False)
    B = rgb.shape[0]
    assert out["out3"].shape == (B, 7)
    assert out["out4"].shape == (B, 7)
    assert out["sx"].shape == (1,)
    assert out["sq"].shape == (1,)
    # quaternions are unit-normalized (ref MainModules.py:381)
    for k in ("out3", "out4"):
        qn = np.linalg.norm(np.asarray(out[k][:, :4]), axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-4)


def test_jit_matches_eager(tiny_setup):
    cfg, model, variables, (rgb, lidar, intrinsic) = tiny_setup
    eager = model.apply(variables, rgb, lidar, intrinsic, train=False)
    jitted = jax.jit(
        lambda v, r, l, i: model.apply(v, r, l, i, train=False)
    )(variables, rgb, lidar, intrinsic)
    np.testing.assert_allclose(
        np.asarray(eager["out3"]), np.asarray(jitted["out3"]), atol=1e-5
    )


def test_train_mode_grads(tiny_setup):
    cfg, model, variables, (rgb, lidar, intrinsic) = tiny_setup
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, **other},
            rgb,
            lidar,
            intrinsic,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )
        return jnp.sum(out["out3"] ** 2) + jnp.sum(out["out4"] ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0.0


def test_resnet_encoder_pyramid():
    """Optional ResNet image encoder (ref src/resnet.py ImageEncoder)."""
    import jax
    from i2pnet_tpu.nn.resnet import ResNetEncoder

    enc = ResNetEncoder(stage_sizes=(1, 1, 1, 1), widths=(8, 8, 16, 16))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 128, 3)).astype(np.float32))
    v = enc.init(jax.random.key(0), x, False)
    c3, c4, c5 = enc.apply(v, x, False)
    assert c3.shape == (1, 8, 16, 8)
    assert c4.shape == (1, 4, 8, 16)
    assert c5.shape == (1, 2, 4, 16)
