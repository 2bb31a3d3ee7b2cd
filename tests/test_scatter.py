"""Tests for the sort-based scatter-add (the gather-VJP hot path).

scatter_add_rows must be value-equal to the native .at[].add scatter, and
take_rows' gradient must match the autodiff gradient of take_along_axis
(the semantics the reference's atomicAdd backwards implement,
ref pointnet2/pointnet2_utils.py:93-101,187-228).
"""

import jax
import jax.numpy as jnp
import numpy as np

from i2pnet_tpu.ops.scatter import scatter_add_rows, take_rows


def _native(ct, idx, n_rows):
    B = ct.shape[0]
    zeros = jnp.zeros((B, n_rows, ct.shape[-1]), ct.dtype)
    return zeros.at[jnp.arange(B)[:, None], idx].add(ct)


def test_scatter_add_rows_matches_native():
    rng = np.random.default_rng(0)
    for B, M, C, N in [(2, 37, 5, 11), (3, 64, 3, 8), (1, 1024, 16, 128)]:
        ct = jnp.asarray(rng.normal(size=(B, M, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, size=(B, M)).astype(np.int32))
        got = np.asarray(scatter_add_rows(ct, idx, N))
        want = np.asarray(_native(ct, idx, N))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_scatter_add_rows_blocked_cumsum_path():
    # M multiple of 512 and > 512 exercises the two-level cumsum
    rng = np.random.default_rng(1)
    B, M, C, N = 2, 2048, 7, 33
    ct = jnp.asarray(rng.normal(size=(B, M, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, M)).astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(scatter_add_rows(ct, idx, N)),
        np.asarray(_native(ct, idx, N)),
        atol=1e-4,
    )


def test_scatter_add_rows_empty_and_full_rows():
    # some target rows receive nothing, one receives everything
    ct = jnp.ones((1, 6, 2), jnp.float32)
    idx = jnp.asarray([[3, 3, 3, 3, 3, 3]], jnp.int32)
    out = np.asarray(scatter_add_rows(ct, idx, 5))
    want = np.zeros((1, 5, 2), np.float32)
    want[0, 3] = 6.0
    np.testing.assert_allclose(out, want)


def test_scatter_add_rows_index_zero_boundary():
    # hits at index 0 exercise the ends==0 / safe-gather edge
    ct = jnp.asarray([[[1.0], [2.0], [4.0]]], jnp.float32)
    idx = jnp.asarray([[0, 0, 2]], jnp.int32)
    out = np.asarray(scatter_add_rows(ct, idx, 3))
    np.testing.assert_allclose(out, [[[3.0], [0.0], [4.0]]])


def test_take_rows_forward_and_grad():
    rng = np.random.default_rng(2)
    B, N, C, M = 2, 19, 4, 31
    pts = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, M)).astype(np.int32))

    np.testing.assert_array_equal(
        np.asarray(take_rows(pts, idx)),
        np.asarray(jnp.take_along_axis(pts, idx[..., None], axis=1)),
    )

    def loss_custom(p):
        return jnp.sum(jnp.sin(take_rows(p, idx)) ** 2)

    def loss_ref(p):
        return jnp.sum(jnp.sin(jnp.take_along_axis(p, idx[..., None], axis=1)) ** 2)

    g_custom = np.asarray(jax.grad(loss_custom)(pts))
    g_ref = np.asarray(jax.grad(loss_ref)(pts))
    np.testing.assert_allclose(g_custom, g_ref, atol=1e-5)


def test_take_rows_grad_bf16_cotangent():
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.normal(size=(1, 9, 3)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    idx = jnp.asarray(rng.integers(0, 9, size=(1, 40)).astype(np.int32))
    g = jax.grad(lambda p: jnp.sum(take_rows(p, idx).astype(jnp.float32)))(pts)
    # each point's grad = number of times it was gathered (f32 accumulation
    # keeps counts up to 40 exact even through a bf16 cotangent)
    counts = np.zeros((1, 9, 3), np.float32)
    for m in np.asarray(idx)[0]:
        counts[0, m] += 1
    np.testing.assert_allclose(np.asarray(g, np.float32), counts)
