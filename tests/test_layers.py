"""NN layer primitives: the scatter-free max-pool VJP.

max_pool_3x3 replaces XLA's select-and-scatter backward (the measured
backward bottleneck at 384x1280 — tools/decompose_backward.py) with
strided-slice + interior-pad routing. Forward must be bit-equal to
nn.max_pool and the gradient must match XLA's autodiff exactly, including
first-match tie routing on constant regions (the reference torch
MaxPool2d(3, s, 1) routes to the first max, basicConv.py:17).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from i2pnet_tpu.nn.layers import max_pool_3x3


def _ref_pool(x, s):
    return nn.max_pool(x, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)))


def test_max_pool_forward_matches():
    rng = np.random.default_rng(0)
    for (H, W, s) in [(8, 10, 1), (8, 10, 2), (9, 11, 2), (7, 7, 1), (5, 6, 3)]:
        x = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(_ref_pool(x, s)), np.asarray(max_pool_3x3(x, s))
        )


def test_max_pool_grad_matches_autodiff():
    rng = np.random.default_rng(1)
    for (H, W, s) in [(8, 10, 1), (9, 11, 2), (5, 6, 3)]:
        x = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
        ct = jnp.asarray(
            rng.normal(size=_ref_pool(x, s).shape).astype(np.float32)
        )
        g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x, s) * ct))(x)
        g_got = jax.grad(lambda x: jnp.sum(max_pool_3x3(x, s) * ct))(x)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-6)


def test_max_pool_grad_tie_routing():
    # constant regions: every window is fully tied; grad must land on the
    # FIRST max in window scan order, exactly like select-and-scatter
    rng = np.random.default_rng(2)
    x = jnp.ones((1, 6, 8, 2), jnp.float32)
    for s in (1, 2):
        ct = jnp.asarray(
            rng.normal(size=_ref_pool(x, s).shape).astype(np.float32)
        )
        g_ref = jax.grad(lambda x: jnp.sum(_ref_pool(x, s) * ct))(x)
        g_got = jax.grad(lambda x: jnp.sum(max_pool_3x3(x, s) * ct))(x)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-6)


def test_max_pool_grad_conserves_cotangent():
    # every output routes its cotangent to exactly one input
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(max_pool_3x3(x, 1) * ct))(x)
    np.testing.assert_allclose(
        float(jnp.sum(g)), float(jnp.sum(ct)), rtol=1e-5
    )


def test_max_pool_bf16():
    rng = np.random.default_rng(4)
    x32 = jnp.asarray(rng.normal(size=(1, 8, 10, 3)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    # max commutes with the monotone cast
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3(x32, 2).astype(jnp.bfloat16)),
        np.asarray(max_pool_3x3(x16, 2)),
    )
