"""Fused eval-mode all-pixels CostVolume kernel (ops/cv_pallas.py) vs the
native XLA path.

The kernel runs the whole pi-side (corr product -> BN-folded mlp1 ->
pi_encoding -> mlp2 -> per-channel softmax attention over K) in VMEM;
these tests pin, in interpret mode on CPU:
1. full-module output equality against the native bf16 path (both
   bval=True and bval=False),
2. the routing guard: engages only at eval / bf16 / elementwise_product /
   all-pixels / supported depths; train and unsupported shapes stay
   native,
3. the DP shard_map wrap under the virtual mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import i2pnet_tpu.ops.cv_pallas as cvp
from i2pnet_tpu.nn.costvolume import CostVolume


def _inputs(seed, B=2, N=16, K=32, C=16):
    rng = np.random.default_rng(seed)
    warped_xyz = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    warped_points = jnp.asarray(
        rng.normal(size=(B, N, C)).astype(np.float32))
    f2_xyz = jnp.asarray(rng.normal(size=(B, K, 3)).astype(np.float32))
    f2_points = jnp.asarray(rng.normal(size=(B, K, C)).astype(np.float32))
    lidar_z = jnp.asarray(
        rng.uniform(1, 5, size=(B, N, 1)).astype(np.float32))
    return warped_xyz, warped_points, f2_xyz, f2_points, lidar_z


def _module(bval):
    return CostVolume(
        nsample=4, nsample_q=-1, mlp1=(16, 8, 8), mlp2=(16, 8),
        corr_func="elementwise_product", backward_validation=bval,
        dtype=jnp.bfloat16,
    )


@pytest.mark.parametrize("bval", [True, False])
def test_fused_cv1_matches_native(monkeypatch, bval):
    inputs = _inputs(0)
    mod = _module(bval)
    monkeypatch.setenv("I2PNET_FUSED_CV", "0")
    variables = mod.init(jax.random.PRNGKey(0), *inputs)
    # non-trivial running stats so the BN folding is actually exercised
    variables = jax.tree_util.tree_map(
        lambda t: t + 0.05 * jnp.arange(t.size, dtype=t.dtype).reshape(
            t.shape) / t.size,
        variables)
    ref = mod.apply(variables, *inputs)

    engaged = []
    real = cvp.fused_cv1_eval

    def spy(*a, **k):
        engaged.append(k.get("dp_axis"))
        return real(*a, **k)

    monkeypatch.setattr(cvp, "fused_cv1_eval", spy)
    monkeypatch.setenv("I2PNET_FUSED_CV", "interpret")
    out = mod.apply(variables, *inputs)
    assert engaged == [None]
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32),
        rtol=3e-2, atol=3e-2)
    # softmax-attention output scale is O(1); require a tight mean error
    assert float(np.mean(np.abs(np.asarray(ref, np.float32)
                                - np.asarray(out, np.float32)))) < 5e-3


def test_fused_cv1_guards(monkeypatch):
    inputs = _inputs(1)
    engaged = []
    real = cvp.fused_cv1_eval

    def spy(*a, **k):
        engaged.append(1)
        return real(*a, **k)

    monkeypatch.setattr(cvp, "fused_cv1_eval", spy)
    monkeypatch.setenv("I2PNET_FUSED_CV", "interpret")

    mod = _module(True)
    variables = mod.init(jax.random.PRNGKey(0), *inputs)
    # train: native (train BN needs batch stats)
    mod.apply(variables, *inputs, train=True, mutable=["batch_stats"])
    assert not engaged
    # f32 config: native
    mod32 = CostVolume(nsample=4, nsample_q=-1, mlp1=(16, 8, 8),
                       mlp2=(16, 8), backward_validation=True)
    v32 = mod32.init(jax.random.PRNGKey(0), *inputs)
    mod32.apply(v32, *inputs)
    assert not engaged
    # unsupported mlp depth: native
    mod2 = CostVolume(nsample=4, nsample_q=-1, mlp1=(16, 8), mlp2=(16, 8),
                      backward_validation=True, dtype=jnp.bfloat16)
    v2 = mod2.init(jax.random.PRNGKey(0), *inputs)
    mod2.apply(v2, *inputs)
    assert not engaged
    # supported eval: engages
    mod.apply(variables, *inputs)
    assert engaged


def test_fused_cv1_dp_shard_map(monkeypatch):
    """Under an ambient pure-DP mesh the kernel rides a shard_map over
    'data' and matches the single-device fused output."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    inputs = _inputs(2, B=8)
    mod = _module(True)
    monkeypatch.setenv("I2PNET_FUSED_CV", "interpret")
    variables = mod.init(jax.random.PRNGKey(0), *inputs)
    ref = jax.jit(lambda v, *a: mod.apply(v, *a))(variables, *inputs)

    engaged = []
    real = cvp.fused_cv1_eval

    def spy(*a, **k):
        engaged.append(k.get("dp_axis"))
        return real(*a, **k)

    monkeypatch.setattr(cvp, "fused_cv1_eval", spy)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    jitted = jax.jit(lambda v, *a: mod.apply(v, *a),
                     in_shardings=(repl,) + (data,) * 5,
                     out_shardings=data)
    with jax.set_mesh(mesh):
        out = jitted(jax.device_put(variables, repl),
                     *[jax.device_put(x, data) for x in inputs])
    assert engaged and engaged[-1] == "data"
    np.testing.assert_allclose(
        np.asarray(ref, np.float32), np.asarray(out, np.float32),
        rtol=1e-5, atol=1e-5)
