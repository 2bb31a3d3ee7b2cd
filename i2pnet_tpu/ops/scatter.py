"""Scatter-add without lax.scatter — the gather-transpose hot path.

The VJP of a batched row gather (take_along_axis over axis 1) is a
scatter-add. XLA's TPU ScatterExpander lowers that to a serial while loop
(one row per iteration): ~10 ms for a (8, 65536)->(8, 8192, C) update,
which made the train step's backward ~4x the forward (round-1 profiling,
tools/profile_backward.py).

The reference solves this with an atomicAdd CUDA kernel
(/root/reference/pointnet2/src/sampling_gpu.cu:8-84, group_points_gpu.cu,
wrappers pointnet2/pointnet2_utils.py:93-101,187-228). TPUs have no
atomics; the TPU-native formulation is sort + segment reduction built
entirely from vector-friendly primitives:

  1. sort_key_val(idx, iota)          — one key/payload sort, (B, M) i32
  2. permute-gather the cotangents    — rows in index order
  3. inclusive blocked cumsum (f32)   — log-depth, VPU-friendly
  4. searchsorted over the sorted keys — run boundaries per output row
  5. out[n] = csum[end(n)-1] - csum[end(n-1)-1]  — two gathers + subtract

No step involves a serial scatter; everything is sorts, gathers, and
elementwise math. Accumulation happens in f32 regardless of the
cotangent dtype (the CUDA atomicAdd baseline also accumulates f32).

`take_rows` wraps the gather with this as its custom VJP; ops/pointops.py
and ops/projection.py route every differentiated gather through it.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Measured on v5e (tools/profile_backward.py, B=8 free-point step): the
# sorted VJP removes all 9 backward scatters from the HLO but is NET SLOWER
# in-graph (166.3 ms vs 136.8 ms) — XLA's batched scatter expansion on these
# (C<=131, M<=16k) shapes is cheaper than the sort+cumsum pipeline, and the
# true backward cost lives elsewhere. Default is therefore the native
# scatter; I2PNET_SORTED_SCATTER=1 opts into the sort-based path (read at
# trace time).
def _use_sorted() -> bool:
    return os.environ.get("I2PNET_SORTED_SCATTER", "0") == "1"


def _inclusive_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum over axis 1 of (B, M, C), two-level blocked.

    One associative_scan over the whole M axis moves the full (B, M, C)
    payload log2(M) times; splitting M into VREG-sized blocks keeps the
    expensive full-payload scan at block length and runs the cross-block
    scan on the (much smaller) block totals.
    """
    B, M, C = x.shape
    bs = 512
    if M % bs != 0 or M <= bs:
        return jax.lax.associative_scan(jnp.add, x, axis=1)
    nb = M // bs
    xb = x.reshape(B, nb, bs, C)
    inner = jax.lax.associative_scan(jnp.add, xb, axis=2)
    totals = inner[:, :, -1, :]  # (B, nb, C)
    offsets = jax.lax.associative_scan(jnp.add, totals, axis=1) - totals
    return (inner + offsets[:, :, None, :]).reshape(B, M, C)


def scatter_add_rows(ct: jnp.ndarray, idx: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """out[b, n] = sum over m with idx[b, m] == n of ct[b, m].

    ct: (B, M, C); idx: (B, M) int32 with values in [0, n_rows).
    Returns (B, n_rows, C) in ct's dtype, accumulated in f32.
    Equivalent to zeros(B, n_rows, C).at[b, idx].add(ct) but with no
    lax.scatter anywhere in the lowering.
    """
    B, M, C = ct.shape
    iota = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (B, M))
    sidx, order = jax.lax.sort_key_val(idx.astype(jnp.int32), iota, dimension=1)
    sct = jnp.take_along_axis(ct.astype(jnp.float32), order[..., None], axis=1)
    csum = _inclusive_cumsum(sct)  # (B, M, C)

    targets = jnp.arange(n_rows, dtype=jnp.int32)
    ends = jax.vmap(partial(jnp.searchsorted, side="right"), in_axes=(0, None))(
        sidx, targets
    )
    ends = ends.astype(jnp.int32)  # (B, n_rows): #elements with idx <= n

    safe = jnp.maximum(ends - 1, 0)
    T = jnp.take_along_axis(csum, safe[..., None], axis=1)
    T = jnp.where((ends > 0)[..., None], T, 0.0)  # cumulative total up to n
    out = T - jnp.concatenate([jnp.zeros_like(T[:, :1]), T[:, :-1]], axis=1)
    return out.astype(ct.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _take_rows_impl(points, idx, n_rows):
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def _take_rows_fwd(points, idx, n_rows):
    return _take_rows_impl(points, idx, n_rows), idx


def _take_rows_bwd(n_rows, idx, ct):
    # ct dtype == primal output dtype == points dtype
    if not _use_sorted():
        B = ct.shape[0]
        zeros = jnp.zeros((B, n_rows, ct.shape[-1]), jnp.float32)
        out = zeros.at[jnp.arange(B)[:, None], idx].add(ct.astype(jnp.float32))
        return out.astype(ct.dtype), None
    return scatter_add_rows(ct, idx, n_rows), None


_take_rows_impl.defvjp(_take_rows_fwd, _take_rows_bwd)


def take_rows(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows: points (B, N, C) by idx (B, M) -> (B, M, C).

    Identical forward to take_along_axis; the backward is
    scatter_add_rows instead of XLA's serial scatter expansion.
    """
    return _take_rows_impl(points, idx, points.shape[1])
