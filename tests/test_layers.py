"""NN layer primitives: the scatter-free max-pool VJP.

max_pool_3x3 replaces XLA's select-and-scatter backward (the measured
backward bottleneck at 384x1280 — tools/decompose_backward.py) with
strided-slice + interior-pad routing. Forward must be bit-equal to
nn.max_pool and the gradient must match XLA's autodiff exactly, including
first-match tie routing on constant regions (the reference torch
MaxPool2d(3, s, 1) routes to the first max, basicConv.py:17).
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2pnet_tpu.nn.layers import _pool3_custom, max_pool_3x3


def _ref_pool(x, s):
    return nn.max_pool(x, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)))


@pytest.fixture(params=["native", "pallas"])
def pool(request):
    """max_pool_3x3 in both backward modes; the pallas mode drives the
    custom VJP directly (same dispatch I2PNET_POOL_PALLAS=1 enables)."""
    if request.param == "native":
        return max_pool_3x3

    def pallas_pool(x, s):
        H, W = x.shape[1:3]
        Ho, Wo = (H - 1) // s + 1, (W - 1) // s + 1
        if s in (1, 2) and H == s * Ho and W == s * Wo:
            return _pool3_custom(x, s)
        return max_pool_3x3(x, s)

    return pallas_pool


def test_max_pool_forward_matches(pool):
    rng = np.random.default_rng(0)
    for (H, W, s) in [(8, 10, 1), (8, 10, 2), (9, 11, 2), (7, 7, 1), (5, 6, 3)]:
        x = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(_ref_pool(x, s)), np.asarray(pool(x, s))
        )


def test_max_pool_grad_matches_autodiff(pool):
    rng = np.random.default_rng(1)
    # (8,10,1) and (8,10,2) take the Pallas routing path (clean shapes);
    # (9,11,2) and (5,6,3) take the native-autodiff fallback
    for (H, W, s) in [(8, 10, 1), (8, 10, 2), (9, 11, 2), (5, 6, 3)]:
        x = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
        ct = jnp.asarray(
            rng.normal(size=_ref_pool(x, s).shape).astype(np.float32)
        )
        g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x, s) * ct))(x)
        g_got = jax.grad(lambda x: jnp.sum(pool(x, s) * ct))(x)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-6)


def test_max_pool_grad_tie_routing(pool):
    # constant regions: every window is fully tied; grad must land on the
    # FIRST max in window scan order, exactly like select-and-scatter
    rng = np.random.default_rng(2)
    x = jnp.ones((1, 6, 8, 2), jnp.float32)
    for s in (1, 2):
        ct = jnp.asarray(
            rng.normal(size=_ref_pool(x, s).shape).astype(np.float32)
        )
        g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x, s) * ct))(x)
        g_got = jax.grad(lambda x: jnp.sum(pool(x, s) * ct))(x)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-6)


def test_max_pool_grad_conserves_cotangent(pool):
    # every output routes its cotangent to exactly one input
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(pool(x, 1) * ct))(x)
    np.testing.assert_allclose(
        float(jnp.sum(g)), float(jnp.sum(ct)), rtol=1e-5
    )


def test_max_pool_bf16(pool):
    rng = np.random.default_rng(4)
    x32 = jnp.asarray(rng.normal(size=(1, 8, 10, 3)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    # max commutes with the monotone cast
    np.testing.assert_array_equal(
        np.asarray(pool(x32, 2).astype(jnp.bfloat16)),
        np.asarray(pool(x16, 2)),
    )


def test_max_pool_allties_backward():
    """All-ties backward (I2PNET_POOL_ALLTIES): equals autodiff exactly on
    tie-free inputs; on ties it distributes the cotangent to every maximal
    entry (a valid subgradient) and still conserves each window's mass
    times its tie count."""
    from i2pnet_tpu.nn.layers import _pool3_allties

    rng = np.random.default_rng(5)
    for (H, W, s) in [(8, 10, 1), (8, 10, 2), (6, 6, 2)]:
        # continuous random draws: ties have probability zero
        x = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
        ct = jnp.asarray(
            rng.normal(size=_ref_pool(x, s).shape).astype(np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(_pool3_allties(x, s)), np.asarray(_ref_pool(x, s))
        )
        g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x, s) * ct))(x)
        g_got = jax.grad(lambda x: jnp.sum(_pool3_allties(x, s) * ct))(x)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=1e-6)

    # tied constant input: every window entry receives the full cotangent
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    ct = jnp.ones((1, 4, 4, 1), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(_pool3_allties(x, 1) * ct))(x)
    # interior point (1,1) is inside 9 windows -> receives 9
    assert float(g[0, 1, 1, 0]) == 9.0

    # env-flag routing through max_pool_3x3
    os.environ["I2PNET_POOL_ALLTIES"] = "1"
    try:
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(max_pool_3x3(x, 2)), np.asarray(_ref_pool(x, 2))
        )
    finally:
        del os.environ["I2PNET_POOL_ALLTIES"]
