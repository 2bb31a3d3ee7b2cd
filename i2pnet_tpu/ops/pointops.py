"""Point-cloud primitives, TPU-native.

Covers the capability surface of the reference's pointnet2 CUDA extension
(/root/reference/pointnet2/src/: sampling_gpu.cu, ball_query_gpu.cu,
group_points_gpu.cu, interpolate_gpu.cu) and its python wrappers
(/root/reference/pointnet_util.py, /root/reference/src/modules/point_utils.py)
— re-designed for XLA:

  * knn is a dense squared-distance matmul (MXU) + lax.top_k, matching the
    reference's actual model path (ref pointnet_util.py:112-123 knn_point,
    which the models use instead of ball query);
  * FPS is an on-device lax.fori_loop starting deterministically at index 0,
    matching the CUDA kernel (ref sampling_gpu.cu:112-117);
  * gathers use take_along_axis (XLA gather), grads are handled by autodiff —
    no hand-written atomicAdd backward needed;
  * everything is static-shape; "variable counts" are expressed by masking.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = False) -> jnp.ndarray:
    """L2 norm with a zero (sub)gradient at x == 0.

    jnp.linalg.norm's gradient is NaN at the origin, and every KNN group
    contains its own center point (diff == 0), so a plain norm poisons
    training. torch.norm (used by the reference, pointnet_util.py:210)
    defines the subgradient at 0 as 0; this matches via the double-where
    trick while keeping the forward value exact.
    """
    sumsq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    positive = sumsq > 0
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, sumsq, 1.0)), 0.0)


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared euclidean distance (B, N, M).

    |s|^2 + |d|^2 - 2 s.d with the cross term on the MXU
    (ref pointnet_util.py:36-57 square_distance).
    """
    # HIGHEST precision: TPU matmuls default to bf16 inputs, whose rounding
    # breaks the |s|^2+|d|^2-2sd cancellation and flips KNN orderings.
    cross = jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s2 = jnp.sum(src * src, axis=-1)[:, :, None]
    d2 = jnp.sum(dst * dst, axis=-1)[:, None, :]
    return s2 + d2 - 2.0 * cross


# approx_min_k recall for the fast TPU KNN path. Measured trade-off
# (tools/knn_accuracy_eval.py + tools/profile_backward.py):
#   0.95: fwd 31.5 ms, ΔRRE +1.32% vs exact on the synthetic protocol
#   0.97: same lowering as 0.95 (identical executable — no change)
#   0.99: ΔRRE -0.14% (noise-level) but fwd 64.5 ms — 2x cost
# Resolution: training keeps the fast approximation (gradient noise
# tolerates 0.993 recall); EVALUATION defaults to exact KNN via
# I2PNET_KNN_MODE=exact (evaluate.py --knn_mode), so reported metrics
# carry no approximation.
KNN_RECALL_TARGET = 0.95


def min_k_indices(scores: jnp.ndarray, k: int, exact_sort: bool | None = None):
    """Indices of the k smallest scores along the last axis, ascending,
    ties broken by lowest index — the exact contract of
    lax.top_k(-scores, k)[1].

    MEASURED SLOWER than lax.top_k on v5e and NOT routed anywhere: the
    TPU sort keeps each row in VMEM (one HBM pass), while k argmin passes
    re-read the scores k times — proj forward regressed 51 -> 74 ms when
    the window select used this. Kept (with tests) as the documented
    negative result; lax.top_k is the right tool at the model's shapes.
    """
    if exact_sort is None:
        exact_sort = jax.default_backend() != "tpu"
    if exact_sort or k > 32:
        _, idx = jax.lax.top_k(-scores, k)
        return idx.astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1)
    s = scores
    out = []
    for _ in range(k):
        i = jnp.argmin(s, axis=-1).astype(jnp.int32)
        out.append(i)
        s = jnp.where(iota == i[..., None], jnp.inf, s)
    return jnp.stack(out, axis=-1)


def blocked_top_k_min(scores: jnp.ndarray, k: int, block: int = 1024):
    """EXACT k-smallest indices along the last axis via two-level top_k.

    Splits N into index-ordered blocks, takes the per-block k best (each
    block's sort is VMEM-resident), then reduces the L*k candidates.
    Exact: the global k best are contained in the union of per-block k
    best. Tie order matches lax.top_k (lowest index first): candidates
    are laid out block-major (= ascending global index) and both levels
    break ties by position.

    MEASURED SLOWER than the single top_k on v5e (exact-KNN forward
    93 -> ~135 ms for the level-1 op): TPU sorts are VPU-compute-bound in
    VMEM, so splitting the row does not reduce the dominant cost and the
    two-level variadic handling adds overhead. Unrouted; kept with tests
    as the documented negative. approx_min_k remains the right level-1
    answer on TPU.
    """
    N = scores.shape[-1]
    if N % block != 0 or N <= block or k > block:
        _, idx = jax.lax.top_k(-scores, k)
        return idx.astype(jnp.int32)
    L = N // block
    lead = scores.shape[:-1]
    sb = scores.reshape(lead + (L, block))
    neg_v, bidx = jax.lax.top_k(-sb, k)  # (..., L, k) per-block ascending
    gidx = bidx + (
        jnp.arange(L, dtype=jnp.int32)[:, None] * block
    )  # global indices, block-major
    cand_scores = (-neg_v).reshape(lead + (L * k,))
    cand_idx = gidx.reshape(lead + (L * k,))
    _, pos = jax.lax.top_k(-cand_scores, k)
    return jnp.take_along_axis(cand_idx, pos, axis=-1).astype(jnp.int32)


def knn_point(
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    exact: bool | None = None,
) -> jnp.ndarray:
    """Indices of the nsample nearest points in xyz for each query in new_xyz.

    xyz: (B, N, C); new_xyz: (B, S, C) -> (B, S, nsample) int32.
    (ref pointnet_util.py:112-123 knn_point; topk over squared distances.)

    TPU path: lax.top_k is the single most expensive op in the whole forward
    (93 ms of a 182 ms step at (8,2048,8192) k=32); approx_min_k's tiled
    partial reduction does it in ~7 ms at recall ~0.99. Ordering uses the
    per-row-shift-invariant score |d|^2 - 2 q.d. exact=None auto-selects:
    exact off TPU (tests, parity), approximate on TPU; the
    I2PNET_KNN_MODE env var (exact|approx, read at trace time) overrides
    the auto-selection — used by tools/knn_accuracy_eval.py to measure the
    approximation's metric cost on identical weights.
    """
    if exact is None:
        env = os.environ.get("I2PNET_KNN_MODE")
        if env == "exact":
            exact = True
        elif env == "approx":
            exact = False
        else:
            exact = jax.default_backend() != "tpu"
    if exact:
        sqrdists = square_distance(new_xyz, xyz)
        _, idx = jax.lax.top_k(-sqrdists, nsample)
        return idx.astype(jnp.int32)
    # HIGH (bf16_3x) is f32-grade for this dot; bf16 scores drop measured
    # recall to 0.94 — not worth it
    dots = jnp.einsum(
        "bsc,bnc->bsn",
        new_xyz,
        xyz,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGH,
    )
    scores = jnp.sum(xyz * xyz, axis=-1)[:, None, :] - 2.0 * dots
    _, idx = jax.lax.approx_min_k(
        scores, nsample, recall_target=KNN_RECALL_TARGET
    )
    return idx.astype(jnp.int32)


def masked_knn_point(
    nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """KNN where points with mask==0 are pushed to +1e10 distance.

    mask: (B, N) in {0, 1}. (ref point_utils.py:19-32 mask_knn_point.)
    """
    sqrdists = square_distance(new_xyz, xyz)
    mask = mask[:, None, :].astype(sqrdists.dtype)
    sqrdists = sqrdists * mask + 1e10 * (1.0 - mask)
    _, idx = jax.lax.top_k(-sqrdists, nsample)
    return idx.astype(jnp.int32)


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather points (B, N, C) by indices (B, S) or (B, S, K) -> (B, S[, K], C).

    (ref pointnet_util.py:60-78 index_points and point_utils.py:5-16
    index_points_group — one batched XLA gather covers both.)

    Routed through take_rows so the transpose (the reference's atomicAdd
    backward, pointnet2_utils.py:93-101) is the sort-based segment sum of
    ops/scatter.py rather than XLA's serial scatter expansion.
    """
    from i2pnet_tpu.ops.scatter import take_rows

    if idx.ndim == 2:
        return take_rows(points, idx)
    if idx.ndim == 3:
        B, S, K = idx.shape
        flat = take_rows(points, idx.reshape(B, S * K))
        return flat.reshape(B, S, K, points.shape[-1])
    raise ValueError(f"idx must be rank 2 or 3, got {idx.ndim}")


# Alias matching the reference's name for (B,N,K) gathers.
group_points = index_points


def farthest_point_sample(
    xyz: jnp.ndarray, npoint: int, use_pallas: bool | None = None
) -> jnp.ndarray:
    """Iterative farthest point sampling. xyz: (B, N, 3) -> (B, npoint) int32.

    Deterministic: starts at index 0, exactly like the reference CUDA kernel
    (ref pointnet2/src/sampling_gpu.cu:95-253; seed point at :112-117).
    On TPU dispatches to the Pallas kernel (ops.fps_pallas) — one kernel,
    VMEM-resident state; elsewhere a lax.fori_loop with a fused (B, N)
    distance update + argmax per step.

    Multi-device guard (same matrix as nn/layers.py _fused_mode): a raw
    pallas_call has no GSPMD partitioning rule, so on a multi-device
    process the kernel engages only under an ambient PURE-DP mesh, riding
    a per-shard ``jax.shard_map`` over the data axis (FPS is per-example);
    any other multi-device trace falls back to the XLA loop, which GSPMD
    partitions itself.
    """
    B = xyz.shape[0]
    dp_axis = None
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
        if use_pallas and jax.device_count() > 1:
            from i2pnet_tpu.nn.layers import _ambient_dp_axis

            dp_axis = _ambient_dp_axis(B)
            if dp_axis is None:
                use_pallas = False
    if use_pallas:
        from i2pnet_tpu.ops.fps_pallas import fps_pallas

        call = lambda g: fps_pallas(g, npoint)
        if dp_axis is not None:
            from jax.sharding import PartitionSpec as _P

            call = jax.shard_map(
                call, in_specs=(_P(dp_axis),), out_specs=_P(dp_axis),
                check_vma=False,
            )
        return call(xyz)
    B, N, _ = xyz.shape

    def body(i, state):
        dist, farthest, idxs = state
        idxs = jax.lax.dynamic_update_slice_in_dim(
            idxs, farthest[:, None], i, axis=1
        )
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return dist, farthest, idxs

    init = (
        jnp.full((B, N), jnp.inf, dtype=xyz.dtype),
        jnp.zeros((B,), dtype=jnp.int32),
        jnp.zeros((B, npoint), dtype=jnp.int32),
    )
    _, _, idxs = jax.lax.fori_loop(0, npoint, body, init)
    return idxs


def ball_query(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> jnp.ndarray:
    """First nsample points within radius, first-hit padding.

    Matches the reference semantics (ref pointnet2/src/ball_query_gpu.cu:10-46
    and pointnet_util.py:126-162 query_ball_point): candidates in ascending
    index order, queries with no hit fall back to index 0's behavior (the
    sorted-N sentinel reduces to the first in-range index, padded).

    Static-shape XLA formulation: sentinel N for out-of-range, sort, slice.
    Capability-parity op — the shipped models use knn, so this is not on the
    hot path.
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqrdists = square_distance(new_xyz, xyz)
    arange = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, S, N))
    cand = jnp.where(sqrdists <= radius * radius, arange, N)
    cand = jnp.sort(cand, axis=-1)[:, :, :nsample]
    first = cand[:, :, 0:1]
    cand = jnp.where(cand == N, first, cand)
    # A query with zero hits yields all-N -> index 0 (reference leaves
    # uninitialized memory in that case; a fixed fallback is strictly
    # safer, and 0 matches the documented first-point behavior).
    return jnp.where(cand == N, 0, cand).astype(jnp.int32)


def three_nn(
    unknown: jnp.ndarray, known: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3 nearest neighbors of each unknown point among known points.

    unknown: (B, N, 3); known: (B, M, 3) -> (dists (B, N, 3), idx (B, N, 3)).
    Distances are euclidean: the reference wrapper sqrt's the CUDA kernel's
    squared distances (ref pointnet2/pointnet2_utils.py:107-129 ThreeNN).
    """
    sqrdists = square_distance(unknown, known)
    neg, idx = jax.lax.top_k(-sqrdists, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(
    points: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted interpolation of features.

    points: (B, M, C); idx: (B, N, 3); weight: (B, N, 3) -> (B, N, C).
    (ref pointnet2/src/interpolate_gpu.cu three_interpolate + wrapper
    pointnet2_utils.py:140-184; grads come free from autodiff.)
    """
    gathered = index_points(points, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolation_weights(dists: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse-distance weights from three_nn squared distances (B, N, 3)."""
    recip = 1.0 / (dists + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)


def grouping(
    feature: jnp.ndarray,
    K: int,
    src_xyz: jnp.ndarray,
    q_xyz: jnp.ndarray,
    raw_src_xyz: jnp.ndarray | None = None,
    raw_q_xyz: jnp.ndarray | None = None,
):
    """KNN-group features around query points.

    feature: (B, N, C); src_xyz: (B, N, 3); q_xyz: (B, S, 3).
    Returns (grouped_xyz (B,S,K,3), xyz_diff (B,S,K,3),
             grouped_feature (B,S,K,C), idx (B,S,K), grouped_raw_xyz or None).

    When raw coordinates are given, neighbor indices come from src/q xyz but
    the geometric diff is computed in raw coordinates
    (ref src/modules/point_utils.py:68-111 grouping with raw_feat_point).

    All co-indexed arrays are packed into ONE gather: TPU gathers are
    per-row latency-bound, so one wide gather beats two or three narrow
    ones over the same indices.
    """
    idx = knn_point(K, src_xyz, q_xyz)
    parts = [src_xyz]
    if raw_src_xyz is not None:
        parts.append(raw_src_xyz)
    parts.append(feature)
    packed = index_points(jnp.concatenate(parts, axis=-1), idx)
    grouped_xyz = packed[..., :3]
    grouped_raw = None
    if raw_src_xyz is not None:
        grouped_raw = packed[..., 3:6]
        grouped_feature = packed[..., 6:]
        xyz_diff = grouped_raw - raw_q_xyz[:, :, None, :]
    else:
        grouped_feature = packed[..., 3:]
        xyz_diff = grouped_xyz - q_xyz[:, :, None, :]
    return grouped_xyz, xyz_diff, grouped_feature, idx, grouped_raw


def sample_and_group(
    npoint: int,
    nsample: int,
    xyz: jnp.ndarray,
    points: jnp.ndarray | None,
    sample_idx: jnp.ndarray | None = None,
    raw_xyz: jnp.ndarray | None = None,
    feat_mode: str | None = None,
):
    """FPS-downsample then KNN-group, building per-group geometric features.

    xyz: (B, N, 3); points: (B, N, D) or None; optional raw_xyz (B, N, 3)
    carries a second coordinate frame whose diffs feed the features
    (ref pointnet_util.py:165-233 sample_and_group).

    feat_mode:
      None        -> cat[xyz_diff(3), grouped_points(D)]
      'dim10feat' -> cat[xyz_diff(3), center(3), grouped_xyz(3), dist(1)]
      'dist'      -> dist(1)

    Returns (new_xyz (B,S,3), new_points (B,S,K,F), fps_idx (B,S),
             new_raw_xyz (B,S,3) or None).
    """
    if sample_idx is not None:
        fps_idx = sample_idx
    else:
        fps_idx = farthest_point_sample(xyz, npoint)

    new_xyz = index_points(xyz, fps_idx)
    new_raw_xyz = index_points(raw_xyz, fps_idx) if raw_xyz is not None else None

    idx = knn_point(nsample, xyz, new_xyz)

    # pack every co-indexed array into one gather (see grouping())
    src = raw_xyz if raw_xyz is not None else xyz
    center = new_raw_xyz if raw_xyz is not None else new_xyz
    need_points = feat_mode not in ("dim10feat", "dist") and points is not None
    if need_points:
        packed = index_points(jnp.concatenate([src, points], axis=-1), idx)
        grouped_xyz = packed[..., :3]
        grouped_points = packed[..., 3:]
    else:
        grouped_xyz = index_points(src, idx)
    grouped_xyz_norm = grouped_xyz - center[:, :, None, :]

    if feat_mode == "dim10feat":
        center_rep = jnp.broadcast_to(center[:, :, None, :], grouped_xyz.shape)
        dist = safe_norm(grouped_xyz_norm, axis=-1, keepdims=True)
        new_points = jnp.concatenate(
            [grouped_xyz_norm, center_rep, grouped_xyz, dist], axis=-1
        )
    elif feat_mode == "dist":
        new_points = safe_norm(grouped_xyz_norm, axis=-1, keepdims=True)
    else:
        if points is not None:
            new_points = jnp.concatenate([grouped_xyz_norm, grouped_points], axis=-1)
        else:
            new_points = grouped_xyz_norm

    return new_xyz, new_points, fps_idx, new_raw_xyz


def mask_grouping(
    feature: jnp.ndarray,
    K: int,
    src_xyz: jnp.ndarray,
    q_xyz: jnp.ndarray,
    mask: jnp.ndarray,
    use_xyz: bool = False,
):
    """KNN-group restricted to mask==1 source points
    (ref src/modules/point_utils.py:35-65 mask_grouping).

    Returns (grouped_xyz (B,S,K,3), xyz_diff, new_points, idx).
    """
    idx = masked_knn_point(K, src_xyz, q_xyz, mask)
    packed = index_points(jnp.concatenate([src_xyz, feature], axis=-1), idx)
    grouped_xyz = packed[..., :3]
    grouped_feature = packed[..., 3:]
    xyz_diff = grouped_xyz - q_xyz[:, :, None, :]
    if use_xyz:
        new_points = jnp.concatenate([xyz_diff, grouped_feature], axis=-1)
    else:
        new_points = grouped_feature
    return grouped_xyz, xyz_diff, new_points, idx
