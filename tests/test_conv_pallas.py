"""Fused Pallas encoder block (ops/conv_pallas.py) — interpret-mode tests.

The kernel rebuilds one reference encoder block (3x3 conv -> BN ->
LeakyReLU(0.1) -> 3x3 max-pool; ref basicConv.py:6-20) in a merged
(B, H, W*C) lane layout. These tests run the Pallas kernel in interpret
mode on CPU against the native XLA formulation, plus the RGBEncoder
integration (I2PNET_FUSED_EVAL=interpret vs native).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2pnet_tpu.nn.layers import RGBEncoder
from i2pnet_tpu.ops.conv_pallas import (
    _pad_cin,
    fused_conv_block,
    pack_block_weights,
    stage_supported,
)


def native_block(x_bhwc, w, scale, shift, stride):
    """conv(bf16, f32 accum) -> f32 scale/shift -> lrelu -> bf16 -> pool."""
    y = jax.lax.conv_general_dilated(
        x_bhwc.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * scale + shift
    y = jnp.where(y >= 0, y, 0.1 * y).astype(jnp.bfloat16)
    return jax.lax.reduce_window(
        y, jnp.asarray(-jnp.inf, y.dtype), jax.lax.max,
        (1, 3, 3, 1), (1, stride, stride, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


CASES = [
    (2, 16, 32, 16, 16, 1, 8),   # stage-1 interior block
    (2, 16, 32, 16, 16, 2, 4),   # stride-2 pool
    (2, 16, 32, 3, 16, 2, 4),    # first block, cin=3 (padded to 4)
    (2, 16, 32, 16, 32, 2, 4),   # block 5, P=4
    (2, 8, 16, 32, 64, 1, 4),    # stage-2 widths
    (1, 8, 16, 64, 128, 2, 2),   # P=1 widest
    (2, 12, 32, 16, 16, 1, 4),   # H not a multiple of ht (12/4)
]


@pytest.mark.parametrize("B,H,W,cin,cout,stride,ht", CASES)
def test_block_matches_native(B, H, W, cin, cout, stride, ht):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, cin)).astype(np.float32))
    w = jnp.asarray(
        0.3 * rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    ref = np.asarray(native_block(x, w, scale, shift, stride), np.float32)

    cin_p = _pad_cin(cin)
    P = 128 // cin_p
    wp = pack_block_weights(w).astype(jnp.bfloat16)
    sc = jnp.tile(scale, P)[None, :]
    sh = jnp.tile(shift, P)[None, :]
    xp = x if cin_p == cin else jnp.pad(
        x, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin)))
    got = fused_conv_block(
        xp.reshape(B, H, W * cin_p), wp, sc, sh,
        H=H, W=W, cin=cin_p, cout=cout, stride=stride, ht_out=ht,
        interpret=True,
    )
    got = np.asarray(got, np.float32).reshape(ref.shape)
    err = float(np.max(np.abs(got - ref)))
    # identical op order in interpret mode -> exact match expected; allow
    # one bf16 ulp of the output magnitude for platform-rounding slack
    assert err <= 0.01 * max(float(np.max(np.abs(ref))), 1.0)


def test_stage_supported_predicate():
    # the shipped free-point config at 384x1280 and proj config at 160x512
    stages = (
        (3, (16, 16, 16, 16, 32), (2, 1, 1, 1, 2)),
        (32, (32, 32, 32, 32, 64), (2, 1, 1, 1, 2)),
        (64, (64, 64, 64, 64, 128), (1, 1, 1, 1, 2)),
    )
    for (H, W) in ((384, 1280), (160, 512)):
        h, w = H, W
        for cin, chans, strides in stages:
            assert stage_supported(h, w, cin, chans, strides)
            for s in strides:
                h, w = h // s, w // s
    # unsupported: W not divisible by the phase count (P=8 for cin=16)
    assert not stage_supported(16, 12, 16, (16,), (1,))
    # unsupported: stride 2 with W*cout not a multiple of 256
    assert not stage_supported(16, 4, 64, (16,), (2,))
    # unsupported: odd H under stride 2
    assert not stage_supported(15, 32, 16, (16,), (2,))


def test_rgb_encoder_fused_eval_matches_native(monkeypatch):
    """RGBEncoder integration: I2PNET_FUSED_EVAL=interpret must match the
    native eval path at bf16-rounding tolerance with the SAME variables."""
    stages = ((3, (16, 16, 32), (2, 1, 2)), (32, (32, 64), (1, 2)))
    enc = RGBEncoder(stages, dtype=jnp.bfloat16)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 3)).astype(np.float32))
    v = enc.init(jax.random.key(0), x, train=False)

    # randomize running stats/affine so the BN fold is non-trivial
    def randomize(tree, key=""):
        if isinstance(tree, dict):
            return {k: randomize(t, k) for k, t in tree.items()}
        r = rng.normal(size=tree.shape).astype(np.float32) * 0.5
        if key == "var":
            r = np.abs(r) + 0.1
        return jnp.asarray(r + (1.0 if key in ("var", "scale") else 0.0))

    v = dict(v)
    v["batch_stats"] = randomize(jax.tree_util.tree_map(np.asarray, dict(v["batch_stats"])))

    monkeypatch.setenv("I2PNET_FUSED_EVAL", "0")
    ref = enc.apply(v, x, train=False)
    monkeypatch.setenv("I2PNET_FUSED_EVAL", "interpret")
    got = enc.apply(v, x, train=False)
    for u, w in zip(ref, got):
        assert u.shape == w.shape and u.dtype == w.dtype
        d = float(jnp.max(jnp.abs(u.astype(jnp.float32) - w.astype(jnp.float32))))
        m = float(jnp.max(jnp.abs(u.astype(jnp.float32))))
        # bf16 rounding differences compound across chained stages (the
        # fused path applies BN in f32, the native bf16-input conv rounds
        # differently); 2% of the activation magnitude bounds it
        assert d <= 0.02 * max(m, 1.0)


def test_fused_eval_not_engaged_f32_or_train(monkeypatch):
    """The fused path must never engage at f32 (parity default) or in
    train mode — outputs stay bit-identical when the flag flips."""
    stages = ((3, (8, 16), (2, 2)),)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 3)).astype(np.float32))

    enc32 = RGBEncoder(stages, dtype=None)
    v = enc32.init(jax.random.key(0), x, train=False)
    monkeypatch.setenv("I2PNET_FUSED_EVAL", "0")
    a = enc32.apply(v, x, train=False)
    monkeypatch.setenv("I2PNET_FUSED_EVAL", "interpret")
    b = enc32.apply(v, x, train=False)
    for u, w in zip(a, b):
        assert u.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(u), np.asarray(w))

    enc16 = RGBEncoder(stages, dtype=jnp.bfloat16)
    v16 = enc16.init(jax.random.key(0), x, train=True)
    monkeypatch.setenv("I2PNET_FUSED_EVAL", "interpret")
    c, mut = enc16.apply(v16, x, train=True, mutable=["batch_stats"])
    monkeypatch.setenv("I2PNET_FUSED_EVAL", "0")
    d, mut2 = enc16.apply(v16, x, train=True, mutable=["batch_stats"])
    for u, w in zip(c, d):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(w))
