"""Fused Pallas encoder under pure data parallelism (shard_map over 'data').

Round 3 left the measured-fastest train path (fused conv+BN+pool Pallas
blocks, BASELINE.md round-3d: 105.1 -> 91.5 ms) disabled on every
multi-device mesh because a raw pallas_call has no GSPMD partitioning rule.
Under PURE DP the batch axis is embarrassingly parallel, so the stage now
runs per-shard inside a ``jax.shard_map`` over the ambient mesh's 'data'
axis, with the BN batch moments psum'd so normalization and gradients match
the global-batch computation GSPMD produces for the native path
(nn/layers.py _ambient_dp_axis / _fused_train, ops/conv_pallas_train.py
fused_stage_train(axis_name=...)).

These tests pin, on the virtual 8-device CPU mesh (interpret-mode kernels):
1. the trace-time guard logic (_fused_mode) across backend/device-count/
   ambient-mesh combinations — including the round-3 advisor's untested-
   guard finding;
2. the fused train path ENGAGES under a dp mesh and produces the same
   loss/gradients/batch-stat updates as the single-device fused step;
3. the fused eval path under dp matches the single-device fused forward.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import i2pnet_tpu.nn.layers as layers
from i2pnet_tpu.nn.layers import RGBEncoderStage, _fused_mode


def _dp_mesh(n=4):
    return Mesh(np.asarray(jax.devices()[:n]), ("data",))


# ---------------------------------------------------------------------------
# 1. guard logic


def test_fused_mode_guard_matrix(monkeypatch):
    """auto stays native on multi-device without an ambient dp mesh; rides
    shard_map when one is present; '1' forces Pallas (advisor round 3)."""
    monkeypatch.setenv("I2PNET_FUSED_TRAIN", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda: 8)

    # multi-device, no ambient mesh: auto -> native, '1' -> forced pallas
    assert _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch=8) == (None, None)
    monkeypatch.setenv("I2PNET_FUSED_TRAIN", "1")
    assert _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch=8) == ("tpu", None)
    monkeypatch.setenv("I2PNET_FUSED_TRAIN", "0")
    assert _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch=8) == (None, None)

    # ambient pure-DP mesh: auto engages via shard_map
    monkeypatch.setenv("I2PNET_FUSED_TRAIN", "auto")
    with jax.set_mesh(_dp_mesh(4)):
        assert _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch=8) == (
            "tpu", "data")
        # batch not divisible by the axis -> native
        assert _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch=6) == (
            None, None)

    # ambient mesh with a >1 non-data axis (spatial): native
    mesh2 = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                 ("data", "space"))
    with jax.set_mesh(mesh2):
        assert _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch=8) == (
            None, None)

    # single device: unchanged
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    assert _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch=8) == ("tpu", None)


def test_fused_mode_cpu_interpret(monkeypatch):
    monkeypatch.setenv("I2PNET_FUSED_TRAIN", "interpret")
    mode, dp = _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch=8)
    assert mode == "interpret" and dp is None
    with jax.set_mesh(_dp_mesh(4)):
        mode, dp = _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch=8)
        assert mode == "interpret" and dp == "data"


# ---------------------------------------------------------------------------
# 2./3. numerical equality, fused engaged


def _stage_setup(train):
    rng = np.random.default_rng(7)
    B, H, W, cin = 8, 16, 32, 3
    channels, strides = (8, 16), (2, 2)
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 4, 8, channels[-1])), jnp.float32)
    mod = RGBEncoderStage(channels, strides, dtype=jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(0), x, train)
    return mod, variables, x, g, channels


def test_dp_fused_train_matches_single_device(monkeypatch):
    monkeypatch.setenv("I2PNET_FUSED_TRAIN", "interpret")
    mod, variables, x, g, channels = _stage_setup(train=True)

    engaged = []
    real = layers._cpt.fused_stage_train

    def spy(*a, **k):
        engaged.append(k.get("axis_name"))
        return real(*a, **k)

    monkeypatch.setattr(layers._cpt, "fused_stage_train", spy)

    def loss(params, batch_stats, x):
        out, upd = mod.apply(
            {"params": params, "batch_stats": batch_stats}, x, True,
            mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) * g), upd

    # single-device fused reference
    (l_ref, upd_ref), gr_ref = jax.jit(
        jax.value_and_grad(loss, has_aux=True))(
        variables["params"], variables["batch_stats"], x)
    assert engaged and engaged[-1] is None

    mesh = _dp_mesh(4)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        jax.value_and_grad(loss, has_aux=True),
        in_shardings=(repl, repl, data),
        out_shardings=((repl, repl), repl),
    )
    with jax.set_mesh(mesh):
        (l_dp, upd_dp), gr_dp = jitted(
            jax.device_put(variables["params"], repl),
            jax.device_put(variables["batch_stats"], repl),
            jax.device_put(x, data),
        )
    # the dp trace must have taken the shard_map'd fused path
    assert engaged[-1] == "data"

    assert abs(float(l_dp) - float(l_ref)) < 1e-4 * (abs(float(l_ref)) + 1.0)
    # batch-stat momentum updates: identical global moments up to psum
    # reduction order
    for j in range(len(channels)):
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(upd_dp["batch_stats"][f"BatchNorm_{j}"][k]),
                np.asarray(upd_ref["batch_stats"][f"BatchNorm_{j}"][k]),
                rtol=1e-5, atol=1e-6, err_msg=f"BatchNorm_{j} {k}")
    # gradients: same kernels per shard; only the moment/psum reduction
    # order differs (a ~1e-7 sc/sh perturbation that can flip bf16
    # roundings in the pool chain — discrete but tiny jumps)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(gr_ref),
        jax.tree_util.tree_leaves(jax.device_get(gr_dp)),
    ):
        name = jax.tree_util.keystr(path)
        if "Conv" in name and "bias" in name:
            # BN-absorbed: pure cancellation residue on both sides (same
            # exclusion as test_rgb_encoder_stage_fused_train_integration)
            continue
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        tol = 1e-3 * float(np.abs(a).max()) + 1e-6
        assert float(np.abs(a - b).max()) <= tol, (
            name, float(np.abs(a - b).max()), tol)


def test_dp_fused_eval_matches_single_device(monkeypatch):
    monkeypatch.setenv("I2PNET_FUSED_EVAL", "interpret")
    mod, variables, x, _, _ = _stage_setup(train=False)

    fwd = lambda v, x: mod.apply(v, x, False)
    out_ref = jax.jit(fwd)(variables, x)

    mesh = _dp_mesh(4)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    jitted = jax.jit(fwd, in_shardings=(repl, data), out_shardings=data)
    with jax.set_mesh(mesh):
        out_dp = jitted(jax.device_put(variables, repl),
                        jax.device_put(x, data))
    # per-example kernels: bit-identical across the shard_map wrap
    np.testing.assert_array_equal(
        np.asarray(out_dp, np.float32), np.asarray(out_ref, np.float32))


def test_dp_fused_full_train_step(monkeypatch):
    """The full DP train step (shard_train_step: grad + Adam + BN stats,
    ambient mesh set by the wrapper) runs with the fused encoder engaged
    and matches the single-device fused step's loss."""
    monkeypatch.setenv("I2PNET_FUSED_TRAIN", "interpret")
    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from i2pnet_tpu.parallel import make_mesh, replicate_spec, shard_batch, \
        shard_train_step
    from i2pnet_tpu.train import create_train_state, make_train_step

    from test_train import _synthetic_batch

    cfg = dataclasses.replace(I2PNetConfig.tiny(), compute_dtype="bfloat16")
    model = I2PNet(cfg)
    batch = _synthetic_batch(cfg, B=8)
    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        train=False)
    state = create_train_state(model, variables, lr=1e-3, steps_per_epoch=10)

    engaged = []
    real = layers._cpt.fused_stage_train

    def spy(*a, **k):
        engaged.append(k.get("axis_name"))
        return real(*a, **k)

    monkeypatch.setattr(layers._cpt, "fused_stage_train", spy)

    _, m_ref = jax.jit(make_train_step(model, cfg))(
        state, batch, jax.random.key(0))
    ref_engaged = list(engaged)

    mesh = make_mesh(jax.devices()[:4])
    step = shard_train_step(make_train_step(model, cfg), mesh)
    state_dp = jax.device_put(state, replicate_spec(mesh))
    _, m_dp = step(state_dp, shard_batch(mesh, batch), jax.random.key(0))

    dp_engaged = engaged[len(ref_engaged):]
    if not ref_engaged:
        pytest.skip("tiny config shapes unsupported by the fused kernels")
    assert dp_engaged and all(a == "data" for a in dp_engaged)
    # psum-reduction-order noise in the BN moments flips borderline bf16
    # roundings / KNN picks downstream (same regime as the spatial test's
    # measured ~0.3% jitter); a real partitioning defect shows at O(100%)
    assert abs(float(m_dp["loss"]) - float(m_ref["loss"])) < 2e-3 * (
        abs(float(m_ref["loss"])) + 1.0)
