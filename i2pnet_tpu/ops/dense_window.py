"""Dense (all-candidate) reformulation of the windowed PointNet levels.

The shipped ``ProjectPointNet`` path is gather-shaped: top-K select over
the kh*kw window candidates, gather the K winners into (B, N, K, C),
then MLP -> stateless BN -> max over K (ref PPBackbone_center.py:54-199).
On TPU the selection + gathers are layout-bound, while the K axis is
consumed ONLY by order-independent reductions: the max, and the
BatchStatsNorm statistics over (B, N, K).

This module re-expresses the level over ALL kh*kw+1 candidate slots
(sentinel included) with a per-slot selection MULTIPLICITY m:

    m[b, n, s] = #times slot s appears among the K selected slots
                 (copy-mode fills duplicate the nearest hit; invalid
                 centers put all K mass on the sentinel slot)

so that max-over-selected == max over {m > 0} and the BN statistics over
the gathered multiset == m-weighted statistics over the slots
(sum(m) == B*N*K exactly).  No top_k ordering, no gathers — everything
is stencil-structured math, which is the form a Pallas kernel (or XLA
itself) can fuse.  Used as the numerical ORACLE for the fused kernel and
as an A/B-able native path.

Exactness: identical real-number semantics to the gathered path;
floating-point differences only from reduction order in the BN
statistics (weighted sums vs gathered sums) — tested at 1e-5 scale.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from i2pnet_tpu.nn.layers import BN_EPS
from i2pnet_tpu.ops.pointops import safe_norm
from i2pnet_tpu.ops.projection import (
    strided_downsample,
    window_candidates,
    window_neighbor_select_grid,
)

__all__ = ["selection_multiplicity", "dense_pointnet_eval"]


def selection_multiplicity(args: jnp.ndarray, khw: int) -> jnp.ndarray:
    """(B, N, K) selected slot indices (khw == sentinel) -> (B, N, khw+1)
    f32 multiplicities. sum over slots == K everywhere."""
    return jax.nn.one_hot(args, khw + 1, dtype=jnp.float32).sum(axis=2)


def _sentinel_slot(grid: jnp.ndarray, N: int) -> jnp.ndarray:
    """The gather path's sentinel candidate: the grid's (0, 0) pixel
    (select_window_features' zero_pix; fused_conv scratch semantics)."""
    B, _, _, C = grid.shape
    return jnp.broadcast_to(grid[:, 0:1, 0:1, :].reshape(B, 1, 1, C),
                            (B, N, 1, C))


def dense_pointnet_eval(
    xyz_raw: jnp.ndarray,
    xyz: jnp.ndarray,
    feature: jnp.ndarray,
    params,
    *,
    out_h: int,
    out_w: int,
    stride_h: int,
    stride_w: int,
    kernel_size: Tuple[int, int],
    nsample: int,
    distance: float,
    mlp: Sequence[int],
    center_mode: bool = False,
    dist_mode: bool = False,
    using_intens: bool = False,
    raw_feat_point: bool = True,
    use_trans: bool = True,
    dtype: Optional[jnp.dtype] = None,
    eps: float = BN_EPS,
    pallas_m: Optional[str] = None,
    dp_axis: Optional[str] = None,
):
    """ProjectPointNet.__call__ with use_bn=True, evaluated densely.

    params: the module's ``params`` subtree (mlp_convs/PointwiseConv_i/
    {Dense_0, BatchStatsNorm_0}).  Returns (new_xyz_raw, new_xyz,
    new_feat) like the module.

    pallas_m: None — multiplicities from the shipped top_k selector;
    "tpu"/"interpret" — the ops/select_pallas.py K-pass kernel (exact
    same multiset; no top_k, no one-hot histogram).

    dp_axis: run the selection-multiplicity pallas_call per-shard under
    ``jax.shard_map`` over that ambient pure-DP mesh axis (the kernel is
    per-example, so no collective is needed; a raw pallas_call has no
    GSPMD partitioning rule). Everything else in the dense path is plain
    XLA, which GSPMD partitions itself — including the m-weighted BN
    statistics, whose batch reductions become psums.
    """
    B, H, W, _ = xyz.shape
    N = out_h * out_w
    kh, kw = kernel_size
    khw = kh * kw
    new_xyz = strided_downsample(xyz, out_h, out_w, stride_h, stride_w)
    new_xyz_raw = strided_downsample(xyz_raw, out_h, out_w, stride_h, stride_w)

    xyz_pr = xyz if use_trans else xyz_raw
    qstride = (stride_h, stride_w)
    if pallas_m is not None:
        from i2pnet_tpu.ops.select_pallas import selection_multiplicity_pallas

        def _sel(g):
            return selection_multiplicity_pallas(
                g, out_h=out_h, out_w=out_w, qstride=qstride,
                kernel_size=kernel_size, K=nsample, distance=distance,
                interpret=(pallas_m == "interpret"),
            )

        if dp_axis is not None:
            from jax.sharding import PartitionSpec as _P

            # check_vma off: pallas_call carries no varying-mesh-axes info
            # for the checker; correctness pinned by tests/test_dp_fused.py
            _sel = jax.shard_map(
                _sel, in_specs=(_P(dp_axis),), out_specs=_P(dp_axis),
                check_vma=False,
            )
        # selection indices are non-differentiable in the gathered path;
        # stop_gradient keeps autodiff from needing a pallas_call VJP
        m = jax.lax.stop_gradient(_sel(xyz_pr))
    else:
        args, _ = window_neighbor_select_grid(
            xyz_pr, xyz_pr, out_h, out_w, qstride, kernel_size, nsample,
            stride=(1, 1), distance=distance, shift=True, copy=True,
        )
        m = selection_multiplicity(args, khw)  # (B, N, khw+1)

    # dense candidate stacks (+ sentinel slot khw), take-based builder —
    # a slot-stacked static-slice builder measured SLOWER here too
    # (fwd 192.9 vs 214.0 pairs/s, BASELINE.md round-4c): XLA fuses the
    # shifted takes into the MLP's first matmul, while the stacked form
    # materializes the (B,N,khw,C) stack in HBM
    src = xyz_raw if raw_feat_point else xyz
    ctr = new_xyz_raw if raw_feat_point else new_xyz
    cand_feat, _ = window_candidates(
        feature, out_h, out_w, qstride, (1, 1), kernel_size, True)
    cand_xyz, _ = window_candidates(
        src, out_h, out_w, qstride, (1, 1), kernel_size, True)
    cand_feat = jnp.concatenate(
        [cand_feat, _sentinel_slot(feature, N)], axis=2)
    cand_xyz = jnp.concatenate([cand_xyz, _sentinel_slot(src, N)], axis=2)

    grouped_norm = cand_xyz - ctr.reshape(B, N, 1, 3)
    if center_mode:
        center_points = jnp.broadcast_to(
            new_xyz.reshape(B, N, 1, 3), cand_xyz.shape)
        dist = safe_norm(grouped_norm, axis=-1, keepdims=True)
        parts = [grouped_norm, center_points, cand_xyz, dist]
        if using_intens:
            parts.append(cand_feat)
        x = jnp.concatenate(parts, axis=-1)
    elif dist_mode:
        x = safe_norm(grouped_norm, axis=-1, keepdims=True)
    else:
        x = jnp.concatenate([grouped_norm, cand_feat], axis=-1)

    # MLP with m-weighted BatchStatsNorm; total weight == B*N*K exactly
    total = jnp.float32(B * N * nsample)
    mw = m[..., None]  # (B, N, S, 1)
    for i, f in enumerate(mlp):
        p = params["mlp_convs"][f"PointwiseConv_{i}"]
        kern = p["Dense_0"]["kernel"]
        bias = p["Dense_0"]["bias"]
        if dtype is not None:
            x = jnp.dot(x.astype(dtype), kern.astype(dtype)) + bias.astype(dtype)
        else:
            x = jnp.dot(x, kern) + bias
        x = x.astype(jnp.float32)
        mean = jnp.sum(x * mw, axis=(0, 1, 2)) / total
        var = jnp.sum(jnp.square(x - mean) * mw, axis=(0, 1, 2)) / total
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        bn = p["BatchStatsNorm_0"]
        x = jax.nn.relu(y * bn["scale"] + bn["bias"])

    # masked max over selected slots (m > 0); every query selects K slots
    # (copy=True), so the mask is never empty
    x = jnp.where(mw > 0, x, -jnp.inf)
    new_feat = jnp.max(x, axis=2).reshape(B, out_h, out_w, -1)
    return new_xyz_raw, new_xyz, new_feat
