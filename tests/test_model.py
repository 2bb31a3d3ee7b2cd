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


def test_efgh_forward_and_guards(tiny_setup):
    """EFGH online-calibration variant: with calib = K @ [I|0] (identity
    extrinsic, camera-frame points) the efgh projection equals K3 @ the
    normalized-plane uv — both the lidar uv and the pixel grid move to the
    feature-pixel frame coherently — and the model runs end-to-end
    (ref warp_utils.py:97-146; routing absent in the reference model, see
    config.efgh)."""
    import dataclasses

    cfg, model, variables, (rgb, lidar, intrinsic) = tiny_setup
    B = rgb.shape[0]
    cfg_e = dataclasses.replace(cfg, efgh=True)
    model_e = I2PNet(cfg_e)
    calib = jnp.concatenate(
        [intrinsic, jnp.zeros((B, 3, 1), jnp.float32)], axis=-1
    )  # K @ [I|0]

    v_e = model_e.init(
        jax.random.key(0), rgb, lidar, intrinsic, calib=calib, train=False
    )
    # identical param trees: the efgh flag only reroutes the projections
    assert jax.tree_util.tree_structure(v_e) == jax.tree_util.tree_structure(
        variables
    )
    out = model_e.apply(v_e, rgb, lidar, intrinsic, calib=calib, train=False)
    assert out["out3"].shape == (B, 7)
    assert bool(jnp.isfinite(out["out3"]).all())

    # geometry: project_with_calib under the scaled calib == K3 @ normalized
    from i2pnet_tpu.models.i2pnet import change_intrinsic
    from i2pnet_tpu.ops import quaternion as Q

    H, W = rgb.shape[1:3]
    # feature dims from the config's pool strides
    s = 1
    for _, _, strides in cfg.rgb_encoder_channels:
        for st in strides:
            s *= st
    h3, w3 = H // s, W // s
    K3 = change_intrinsic(intrinsic, (h3, w3), (H, W))
    scale = jnp.asarray([[w3 / W], [h3 / H], [1.0]], jnp.float32)
    calib3 = calib * scale
    uv_e, z_e = Q.project_with_calib(lidar, calib3)
    uv_n, z_n = Q.project_to_normalized_plane(lidar)
    want = jnp.einsum("bij,bnj->bni", K3, uv_n)
    np.testing.assert_allclose(np.asarray(uv_e), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # guards: calib required; masks excluded (ref train script :738-740)
    with pytest.raises(ValueError):
        model_e.apply(v_e, rgb, lidar, intrinsic, train=False)
    cfg_bad = dataclasses.replace(cfg_e, use_projection_mask=True,
                                  layer_mask=(True, True))
    with pytest.raises(ValueError):
        I2PNet(cfg_bad).apply(v_e, rgb, lidar, intrinsic, calib=calib,
                              train=False)
