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


def test_proj_dense_eval_mode_guard_matrix(monkeypatch):
    """The dense-eval gate carries the fused-encoder guard matrix
    (round-4 verdict item 2a): auto falls back to the gathered path on
    multi-device without an ambient pure-DP mesh; rides shard_map when
    one is present; train always stays gathered."""
    from jax.sharding import Mesh

    from i2pnet_tpu.nn.proj_backbone import proj_dense_eval_mode

    monkeypatch.setenv("I2PNET_PROJ_DENSE_EVAL", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda: 8)

    assert proj_dense_eval_mode(True, 8) == (None, None)  # train: off
    # multi-device, no ambient mesh: gathered fallback (NOT a raw
    # pallas_call under a sharded jit)
    assert proj_dense_eval_mode(False, 8) == (None, None)

    with jax.set_mesh(Mesh(np.asarray(jax.devices()[:4]), ("data",))):
        assert proj_dense_eval_mode(False, 8) == ("tpu", "data")
        # batch not divisible by the axis -> gathered
        assert proj_dense_eval_mode(False, 6) == (None, None)
    with jax.set_mesh(Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                           ("data", "space"))):
        assert proj_dense_eval_mode(False, 8) == (None, None)

    monkeypatch.setattr(jax, "device_count", lambda: 1)
    assert proj_dense_eval_mode(False, 8) == ("tpu", None)
    monkeypatch.setenv("I2PNET_PROJ_DENSE_EVAL", "0")
    assert proj_dense_eval_mode(False, 8) == (None, None)


def test_dense_eval_dp_matches_single_device(monkeypatch):
    """Under an ambient pure-DP mesh the dense-eval path ENGAGES with the
    selection-multiplicity kernel riding a shard_map over 'data', and the
    sharded module output matches the single-device gathered path
    (round-4 verdict item 2a; template: tests/test_dp_fused.py)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import i2pnet_tpu.ops.dense_window as dw

    xyz_raw, xyz, feat = _grids(7, B=8)
    kw = dict(
        out_h=4, out_w=8, stride_h=2, stride_w=2, kernel_size=(3, 5),
        nsample=4, distance=1.5, mlp=(8, 16),
    )
    mod = ProjectPointNet(use_trans=True, use_bn=True, **kw)
    monkeypatch.setenv("I2PNET_PROJ_DENSE_EVAL", "0")
    variables = mod.init(
        jax.random.PRNGKey(2), xyz_raw, xyz, feat, center_mode=True)
    fwd = lambda v, a, b, c: mod.apply(v, a, b, c, center_mode=True)
    _, _, ref = jax.jit(fwd)(variables, xyz_raw, xyz, feat)

    monkeypatch.setenv("I2PNET_PROJ_DENSE_EVAL", "interpret")
    engaged = []
    real = dw.dense_pointnet_eval

    def spy(*a, **k):
        engaged.append(k.get("dp_axis"))
        return real(*a, **k)

    monkeypatch.setattr(dw, "dense_pointnet_eval", spy)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    jitted = jax.jit(fwd, in_shardings=(repl, data, data, data),
                     out_shardings=data)
    with jax.set_mesh(mesh):
        _, _, out = jitted(jax.device_put(variables, repl),
                           jax.device_put(xyz_raw, data),
                           jax.device_put(xyz, data),
                           jax.device_put(feat, data))
    assert engaged and engaged[-1] == "data"
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)


def test_dense_eval_routing_through_module(monkeypatch):
    """I2PNET_PROJ_DENSE_EVAL=1 routes ProjectPointNet eval through the
    dense path (Pallas K-pass multiplicities, the TPU eval default)
    with the SAME param tree and matching outputs;
    train=True must stay on the gathered path regardless."""
    xyz_raw, xyz, feat = _grids(5)
    kw = dict(
        out_h=4, out_w=8, stride_h=2, stride_w=2, kernel_size=(3, 5),
        nsample=4, distance=1.5, mlp=(8, 16),
    )
    mod = ProjectPointNet(use_trans=True, use_bn=True, **kw)
    monkeypatch.setenv("I2PNET_PROJ_DENSE_EVAL", "0")
    variables = mod.init(
        jax.random.PRNGKey(1), xyz_raw, xyz, feat, center_mode=True)
    _, _, ref = mod.apply(variables, xyz_raw, xyz, feat, center_mode=True)
    _, _, ref_train = mod.apply(
        variables, xyz_raw, xyz, feat, center_mode=True, train=True)
    monkeypatch.setenv("I2PNET_PROJ_DENSE_EVAL", "1")
    _, _, out = mod.apply(variables, xyz_raw, xyz, feat, center_mode=True)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)
    # train mode keeps the gathered path bit-for-bit (dense is eval-only)
    _, _, out_train = mod.apply(
        variables, xyz_raw, xyz, feat, center_mode=True, train=True)
    np.testing.assert_array_equal(
        np.asarray(ref_train), np.asarray(out_train))
