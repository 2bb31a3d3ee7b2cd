"""Range-image (spherical projection) ops, TPU-native.

Covers the reference's projectPN primitives:
  * spherical_project == project_seq/project (ref src/projectPN/utils.py:
    111-251): scatter a raw cloud into a (H, W) range image, nearest point
    wins per cell. The reference sorts by descending range and relies on a
    per-batch python loop + last-write-wins scatter; here the winner per
    cell is computed with order-independent segment_min + one gather, so it
    jits, batches, and runs deterministically on TPU.
  * window_neighbor_select == the fused_conv_select_k CUDA kernel
    (ref src/projectPN/fused_conv_select/fused_conv_go.cu:11-264): for each
    query cell, scan a kH x kW window on a (possibly strided) second range
    image, reject invalid (all-zero) pixels and pixels beyond `distance`,
    take the K nearest by 3D distance. FLAG_SHIFT == cylindrical wrap in W;
    FLAG_COPY == replicate the nearest when fewer than K found.
    Vectorized: window gather + masked top_k (window <= 135 taps).
  * grid helpers == get_idx_cuda / get_stride_idx_cuda / gather_torch /
    check_valid (ref utils.py:8-60, 106-108).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INVALID_DIST = 1e10


def _patches_eligible(out_h, out_w, qstride, stride, kernel_size, h2, w2,
                      shift) -> bool:
    """Eligibility for the OPT-IN im2col candidate path: window centers at
    i * qstride (stride == 1) with cylindrical W wrap, and the conv output
    geometry lands exactly on (out_h, out_w).

    MEASURED NEGATIVE in situ (BASELINE.md round-3 proj-forward attack):
    standalone the im2col select is 3.6x faster than the shifted-takes
    builder (18 -> 5 ms), but inside the full jitted proj model it LOSES
    (fwd 159.0 -> 152.9 pairs/s, train 79.7 -> 69.2) — XLA fuses the
    strided-slice takes into their consumers, while conv_patches
    materializes the (B, N, C*khw) stack and its backward adds a
    transpose-conv over the wrap-concat. Kept behind I2PNET_GRID_PATCHES=1
    (equality-tested) in case future shapes/compilers change the tradeoff."""
    if os.environ.get("I2PNET_GRID_PATCHES") != "1":
        return False
    if stride != (1, 1) or not shift:
        return False
    kh, kw = kernel_size
    oh = (h2 + (kh // 2) + (kh - 1 - kh // 2) - kh) // qstride[0] + 1
    ow = (w2 + (kw - 1) - kw) // qstride[1] + 1
    return oh == out_h and ow == out_w


def _patches_candidates(
    src: jnp.ndarray,
    out_h: int,
    out_w: int,
    qstride: Tuple[int, int],
    kernel_size: Tuple[int, int],
) -> jnp.ndarray:
    """Candidate stack (B, out_h*out_w, C, khw) via ONE XLA im2col
    (conv_general_dilated_patches, NHWC in/out — TPU's native conv
    layout) instead of kh*kw shifted strided-slice takes + a 6-D
    transpose. The khw axis lands MINOR, so the caller's distance
    reduction needs no relayout and the K-gather runs along the minor
    axis (the fast take_along pattern).

    Cylindrical W wrap (FLAG_SHIFT) via edge-strip concat; out-of-bounds H
    rows become EXACT zeros, which the caller's q_valid test rejects just
    as the take-path's in_bounds mask does (identical d_masked values).
    """
    B, h2, w2, C = src.shape
    kh, kw = kernel_size
    x = jnp.concatenate(
        [src[:, :, w2 - (kw // 2):], src, src[:, :, : kw - 1 - kw // 2]],
        axis=2,
    )
    p = jax.lax.conv_general_dilated_patches(
        x,
        (kh, kw),
        window_strides=qstride,
        padding=((kh // 2, kh - 1 - kh // 2), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, out_h, out_w, C*kh*kw); channels laid out as (C, kh, kw)
    return p.reshape(B, out_h * out_w, C, kh * kw)


def check_valid(xyz: jnp.ndarray) -> jnp.ndarray:
    """1.0 where any coordinate is nonzero (ref utils.py:106-108)."""
    return jnp.any(xyz != 0, axis=-1, keepdims=True).astype(jnp.float32)


def grid_indices(B: int, H: int, W: int) -> jnp.ndarray:
    """(B, H*W, 2) int32 (h, w) coords, row-major (ref utils.py:8-15)."""
    h = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    w = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    idx = jnp.stack([h, w], axis=-1).reshape(1, H * W, 2)
    return jnp.broadcast_to(idx, (B, H * W, 2))


def strided_grid_indices(
    B: int, out_h: int, out_w: int, stride_h: int, stride_w: int
) -> jnp.ndarray:
    """(B, out_h*out_w, 2) coords of the strided grid in the fine frame
    (ref utils.py:28-33)."""
    h = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 0) * stride_h
    w = jax.lax.broadcasted_iota(jnp.int32, (out_h, out_w), 1) * stride_w
    idx = jnp.stack([h, w], axis=-1).reshape(1, out_h * out_w, 2)
    return jnp.broadcast_to(idx, (B, out_h * out_w, 2))


def gather_grid(
    feature: jnp.ndarray, h_idx: jnp.ndarray, w_idx: jnp.ndarray
) -> jnp.ndarray:
    """Gather (B, H, W, C) by per-batch (h, w) index arrays of any shape
    (ref utils.py:36-60 gather_torch, one flattened XLA gather; the
    transpose goes through ops/scatter.take_rows' sort-based segment sum
    instead of XLA's serial scatter)."""
    from i2pnet_tpu.ops.scatter import take_rows

    B, H, W, C = feature.shape
    flat = feature.reshape(B, H * W, C)
    lin = (h_idx * W + w_idx).reshape(B, -1)
    out = take_rows(flat, lin)
    return out.reshape(h_idx.shape + (C,))


def strided_downsample(
    grid: jnp.ndarray, out_h: int, out_w: int, stride_h: int, stride_w: int
) -> jnp.ndarray:
    """Select every (stride_h, stride_w)-th cell (ref get_sample_idx +
    gather; a plain strided slice under XLA)."""
    return grid[:, : out_h * stride_h : stride_h, : out_w * stride_w : stride_w]


def spherical_project(
    xyz: jnp.ndarray,
    features: Sequence[jnp.ndarray],
    H: int,
    W: int,
    fup: float = 2.0,
    fdown: float = -24.8,
    use_rank: bool = True,
    ref_pad_quirk: bool = False,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Project a raw cloud into a spherical range image.

    xyz: (B, N, 3); features: list of (B, N, Di). Zero-padded points (all
    three coords 0) never win a cell. Returns (xyz_proj (B,H,W,3),
    [feat_proj (B,H,W,Di)]). Row/col mapping matches ref utils.py:126-155:
    col from azimuth, row from elevation (top -> down), clamped.

    use_rank=True: nearest point wins per cell (ref project_seq's
    descending-range sort + last-write scatter, utils.py:158-177).
    use_rank=False: last point in input order wins (the shipped proj config
    sets cfg.rank=False, config_proj_lidarcenter.py:25, so the reference
    scatters in raw input order). Both are expressed order-independently
    (segment_min / segment_max) so they jit and run deterministically.

    ref_pad_quirk: the reference computes asin(0/0) = NaN rows for zero-pad
    points and scatters them anyway — on torch-CPU they land on cell
    (0, W//2), zeroing it (pad features are zeros). True reproduces that
    cell stomp for checkpoint/numeric parity; False keeps the clean
    semantics (pads never win).
    """
    B, N, _ = xyz.shape
    az_res = (2.0 * jnp.pi) / W
    v_res = (fup - fdown) * jnp.pi / 180.0 / (H - 1)
    v_offset = -(fdown * jnp.pi / 180.0) / v_res

    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1))
    valid = r > 0.0

    col = jnp.floor((jnp.pi - jnp.arctan2(y, x)) / az_res).astype(jnp.int32)
    beta = jnp.arcsin(jnp.where(valid, z / jnp.where(valid, r, 1.0), 0.0))
    row = H - jnp.floor(beta / v_res + v_offset).astype(jnp.int32)
    row = jnp.clip(row, 0, H - 1)
    col = jnp.clip(col, 0, W - 1)

    # one flat segment id per (batch, cell); invalid points to a trash cell
    cell = row * W + col
    num_cells = H * W
    batch_offset = jnp.arange(B, dtype=jnp.int32)[:, None] * num_cells
    seg = jnp.where(valid, cell + batch_offset, B * num_cells).reshape(-1)

    point_idx = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, :], (B, N)
    ).reshape(-1)
    if use_rank:
        # winner per cell: min range, ties broken by lowest point index —
        # deterministic and order-independent (the reference's descending-
        # range sort + last-write scatter leaves ties unspecified)
        r_flat = jnp.where(valid, r, jnp.inf).reshape(-1)
        min_r = jax.ops.segment_min(
            r_flat, seg, num_segments=B * num_cells + 1
        )
        is_winner = (r_flat <= min_r[seg]) & (r_flat < jnp.inf)
        cand_idx = jnp.where(is_winner, point_idx, N)
        winner_idx = jax.ops.segment_min(
            cand_idx, seg, num_segments=B * num_cells + 1
        )[: B * num_cells].reshape(B, num_cells)
    else:
        # last write in input order wins == max point index per cell
        cand_idx = jnp.where(valid.reshape(-1), point_idx, -1)
        winner_last = jax.ops.segment_max(
            cand_idx, seg, num_segments=B * num_cells + 1
        )[: B * num_cells].reshape(B, num_cells)
        winner_idx = jnp.where(winner_last >= 0, winner_last, N)

    has_winner = (winner_idx < N)[..., None]
    safe_idx = jnp.minimum(winner_idx, N - 1)

    # ONE packed winner gather for xyz + all feature arrays (TPU gathers are
    # per-row latency-bound; see ops.pointops.grouping)
    packed = jnp.concatenate([xyz] + list(features), axis=-1)
    picked = jnp.take_along_axis(packed, safe_idx[..., None], axis=1)
    picked = jnp.where(has_winner, picked, 0.0)
    picked = picked.reshape(B, H, W, packed.shape[-1])
    xyz_proj = picked[..., :3]
    feat_projs = []
    off = 3
    for f in features:
        feat_projs.append(picked[..., off : off + f.shape[-1]])
        off += f.shape[-1]
    if ref_pad_quirk:
        keep = jnp.where(jnp.all(valid, axis=1), 1.0, 0.0)[:, None]  # (B,1)
        xyz_proj = xyz_proj.at[:, 0, W // 2, :].multiply(keep)
        feat_projs = [f.at[:, 0, W // 2, :].multiply(keep) for f in feat_projs]
    return xyz_proj, feat_projs


def window_neighbor_select(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    idx_hw: jnp.ndarray,
    kernel_size: Tuple[int, int],
    K: int,
    stride: Tuple[int, int] = (1, 1),
    distance: float = 10.0,
    shift: bool = True,
    copy: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Windowed K-nearest neighbor select on range images.

    xyz1: (B, H, W, 3) query grid; xyz2: (B, h2, w2, 3) search grid;
    idx_hw: (B, N, 2) query coords into xyz1. Window centers at
    (h // stride_h, w // stride_w) on xyz2. Returns
    (h_idx (B,N,K), w_idx (B,N,K), valid_mask (B,N,K,1) float).

    Faithful to ref fused_conv_go.cu:11-238 (incl. the FLAG_COPY edge where
    mask is 1 for all K whenever the center is valid) but vectorized:
    static window gather + masked lax.top_k instead of per-thread selection
    sort. shift == FLAG_SHIFT (cylindrical W wrap, H clipped);
    copy == FLAG_COPY (pad missing neighbors with the nearest).
    """
    B, H, W, _ = xyz1.shape
    h2, w2 = xyz2.shape[1], xyz2.shape[2]
    kh, kw = kernel_size
    khw = kh * kw
    N = idx_hw.shape[1]

    center = gather_grid(xyz1, idx_hw[..., 0], idx_hw[..., 1])  # (B,N,3)
    center_valid = jnp.sum(center * center, axis=-1) > 1e-10  # (B,N)

    base_h = idx_hw[..., 0] // stride[0]
    base_w = idx_hw[..., 1] // stride[1]
    dh = jax.lax.broadcasted_iota(jnp.int32, (kh, kw), 0).reshape(-1) - kh // 2
    dw = jax.lax.broadcasted_iota(jnp.int32, (kh, kw), 1).reshape(-1) - kw // 2

    hh = base_h[..., None] + dh  # (B,N,khw)
    ww = base_w[..., None] + dw
    h_in = (hh >= 0) & (hh < h2)
    if shift:
        ww = jnp.mod(ww, w2)
        w_in = jnp.ones_like(h_in)
    else:
        w_in = (ww >= 0) & (ww < w2)
    hc = jnp.clip(hh, 0, h2 - 1)
    wc = jnp.clip(ww, 0, w2 - 1)

    q = gather_grid(xyz2, hc, wc)  # (B,N,khw,3)
    q_valid = jnp.sum(q * q, axis=-1) > 1e-10
    d = jnp.maximum(
        jnp.sum((center[:, :, None, :] - q) ** 2, axis=-1), 1e-10
    )
    valid = h_in & w_in & q_valid & (d <= distance * distance)
    d_masked = jnp.where(valid, d, _INVALID_DIST)

    if K > khw:
        # K larger than the window: pad with invalid slots, like the CUDA
        # kernel's 1e10-initialized scratch beyond kernel_total
        pad = ((0, 0), (0, 0), (0, K - khw))
        d_masked = jnp.pad(d_masked, pad, constant_values=_INVALID_DIST)
        hc = jnp.pad(hc, pad)
        wc = jnp.pad(wc, pad)

    neg_d, args = jax.lax.top_k(-d_masked, K)  # ties -> lowest window index
    d_sel = -neg_d
    h_sel = jnp.take_along_axis(hc, args, axis=-1)
    w_sel = jnp.take_along_axis(wc, args, axis=-1)
    mask = d_sel < _INVALID_DIST

    if copy:
        # pad missing slots with the nearest hit; mask is 1 for every K slot
        # as long as the center is valid (ref fused_conv_go.cu:211-222). If
        # no hit exists at all the kernel copies the zero-initialized (0, 0)
        # scratch entries — reproduce that too.
        any_hit = mask[..., :1]
        nearest_h = jnp.where(any_hit, h_sel[..., :1], 0)
        nearest_w = jnp.where(any_hit, w_sel[..., :1], 0)
        h_sel = jnp.where(mask, h_sel, nearest_h)
        w_sel = jnp.where(mask, w_sel, nearest_w)
        mask = jnp.ones_like(mask)

    cv = center_valid[..., None]
    mask = mask & cv
    h_sel = jnp.where(mask, h_sel, 0)
    w_sel = jnp.where(mask, w_sel, 0)
    return h_sel, w_sel, mask[..., None].astype(jnp.float32)


def _window_bounds(out_h, out_w, qstride, stride, kernel_size, h2, w2, shift):
    """in_bounds (out_h*out_w, kh*kw) for window_candidates' slot order."""
    kh, kw = kernel_size
    ch = (np.arange(out_h) * qstride[0]) // stride[0]
    cw = (np.arange(out_w) * qstride[1]) // stride[1]
    rows = ch[:, None] + (np.arange(kh) - kh // 2)[None, :]
    cols = cw[:, None] + (np.arange(kw) - kw // 2)[None, :]
    row_ok = (rows >= 0) & (rows < h2)
    col_ok = np.ones_like(cols, bool) if shift else (cols >= 0) & (cols < w2)
    return jnp.asarray(
        (row_ok[:, None, :, None] & col_ok[None, :, None, :]).reshape(
            out_h * out_w, kh * kw
        )
    )


def window_candidates(
    src: jnp.ndarray,
    out_h: int,
    out_w: int,
    qstride: Tuple[int, int],
    stride: Tuple[int, int],
    kernel_size: Tuple[int, int],
    shift: bool = True,
):
    """Window candidates for REGULAR-GRID queries, gather-free.

    Query q = (i * qstride_h, j * qstride_w); its window centers at
    (q_h // stride_h, q_w // stride_w) on `src`. Because queries form a
    regular grid, each window offset is one shifted strided slice of the
    grid (two single-axis takes) instead of a random gather — on TPU this
    is the difference between memcpy-speed and a scalar gather loop
    (measured 47 ms -> ~2 ms for the 3600q x 135-tap level-1 select).

    Returns (cand (B, out_h*out_w, khw, C), in_bounds (out_h*out_w, khw)).

    A slot-stacked static-slice builder (pad + one lax.slice per window
    offset) was deleted as a measured negative: it loses BOTH under
    gather-shaped consumers (fwd 152.9 vs 166.8 pairs/s bf16) and under
    the dense eval MLP (192.9 vs 214.0) — XLA fuses the shifted takes
    into either consumer, the stacked form materializes the candidate
    stack in HBM (BASELINE.md round-4b/4c).
    """
    B, h2, w2, C = src.shape
    kh, kw = kernel_size
    ch = (jnp.arange(out_h, dtype=jnp.int32) * qstride[0]) // stride[0]
    cw = (jnp.arange(out_w, dtype=jnp.int32) * qstride[1]) // stride[1]
    dh = jnp.arange(kh, dtype=jnp.int32) - kh // 2
    dw = jnp.arange(kw, dtype=jnp.int32) - kw // 2

    rows = ch[:, None] + dh[None, :]  # (out_h, kh)
    cols = cw[:, None] + dw[None, :]  # (out_w, kw)
    row_ok = (rows >= 0) & (rows < h2)
    if shift:
        cols_idx = jnp.mod(cols, w2)
        col_ok = jnp.ones_like(cols, dtype=bool)
    else:
        col_ok = (cols >= 0) & (cols < w2)
        cols_idx = jnp.clip(cols, 0, w2 - 1)
    rows_idx = jnp.clip(rows, 0, h2 - 1)

    # factor the window: one take per axis over the UNIQUE row/col offsets
    t1 = jnp.take(src, rows_idx, axis=1)  # (B, out_h, kh, w2, C)
    t2 = jnp.take_along_axis(
        t1[:, :, :, None, :, :],  # (B, out_h, kh, 1, w2, C)
        cols_idx.T[None, None, None, :, :, None],  # (1,1,1,kw,out_w,1)
        axis=4,
    )  # (B, out_h, kh, kw, out_w, C)
    cand = jnp.transpose(t2, (0, 1, 4, 2, 3, 5)).reshape(
        B, out_h * out_w, kh * kw, C
    )
    in_bounds = (
        row_ok[:, None, :, None] & col_ok[None, :, None, :]
    ).reshape(out_h * out_w, kh * kw)
    return cand, in_bounds


def window_neighbor_select_grid(
    xyz1: jnp.ndarray,
    xyz2: jnp.ndarray,
    out_h: int,
    out_w: int,
    qstride: Tuple[int, int],
    kernel_size: Tuple[int, int],
    K: int,
    stride: Tuple[int, int] = (1, 1),
    distance: float = 10.0,
    shift: bool = True,
    copy: bool = False,
):
    """window_neighbor_select specialized for regular-grid queries.

    Same semantics as window_neighbor_select with
    idx_hw = strided_grid_indices(B, out_h, out_w, *qstride), but built from
    slices; returns (args (B,N,K) candidate indices, mask (B,N,K,1)).
    args == kh*kw is the sentinel for "gather grid pixel (0, 0)" — the
    fused_conv kernel's zero-initialized scratch behavior for no-hit /
    invalid-center slots; select_window_features resolves it.
    """
    B = xyz1.shape[0]
    N = out_h * out_w
    center = strided_downsample(
        xyz1, out_h, out_w, qstride[0], qstride[1]
    ).reshape(B, N, 3)
    center_valid = jnp.sum(center * center, axis=-1) > 1e-10

    h2, w2 = xyz2.shape[1:3]
    if _patches_eligible(out_h, out_w, qstride, stride, kernel_size,
                         h2, w2, shift):
        # im2col fast path: candidates arrive as (B, N, C, khw) with khw
        # minor — distances reduce over C with no relayout and top_k runs
        # directly on the (B, N, khw) plane
        cand_t = _patches_candidates(xyz2, out_h, out_w, qstride, kernel_size)
        center_t = center[:, :, :, None]  # (B, N, 3, 1)
        d_masked = jnp.maximum(
            jnp.sum((center_t - cand_t) ** 2, axis=2), 1e-10
        )  # (B, N, khw)
        q_valid_t = jnp.sum(cand_t * cand_t, axis=2) > 1e-10
        valid_t = q_valid_t & (d_masked <= distance * distance)
        d_masked = jnp.where(valid_t, d_masked, _INVALID_DIST)
    else:
        cand, in_bounds = window_candidates(
            xyz2, out_h, out_w, qstride, stride, kernel_size, shift
        )
        q_valid = jnp.sum(cand * cand, axis=-1) > 1e-10
        d = jnp.maximum(
            jnp.sum((center[:, :, None, :] - cand) ** 2, axis=-1), 1e-10
        )
        valid = in_bounds[None] & q_valid & (d <= distance * distance)
        d_masked = jnp.where(valid, d, _INVALID_DIST)

    khw = d_masked.shape[-1]
    if K > khw:
        pad = ((0, 0), (0, 0), (0, K - khw))
        d_masked = jnp.pad(d_masked, pad, constant_values=_INVALID_DIST)

    neg_d, args = jax.lax.top_k(-d_masked, K)
    d_sel = -neg_d
    hit = d_sel < _INVALID_DIST
    args = jnp.minimum(args, khw - 1)  # clamp K>khw pad slots

    if copy:
        any_hit = hit[..., :1]
        nearest = jnp.where(any_hit, args[..., :1], khw)
        args = jnp.where(hit, args, nearest)
        mask = jnp.ones_like(hit)
    else:
        args = jnp.where(hit, args, khw)
        mask = hit
    cv = center_valid[..., None]
    args = jnp.where(cv, args, khw)
    mask = mask & cv
    return args, mask[..., None].astype(jnp.float32)


def select_window_features(
    feat_grid: jnp.ndarray,
    args: jnp.ndarray,
    out_h: int,
    out_w: int,
    qstride: Tuple[int, int],
    stride: Tuple[int, int],
    kernel_size: Tuple[int, int],
    shift: bool = True,
    candidates: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Gather grid features for window selections: build the candidate stack
    (+ the pixel-(0,0) sentinel slot at index kh*kw), then take_along the
    (small) window axis. Returns (B,N,K,C).

    With I2PNET_GRID_PATCHES=1 (opt-in; measured negative in situ, see
    _patches_eligible) eligible shapes use the im2col candidate builder and
    gather along its minor khw axis instead."""
    B, h2, w2, C = feat_grid.shape
    N = out_h * out_w
    if candidates is None and _patches_eligible(
        out_h, out_w, qstride, stride, kernel_size, h2, w2, shift
    ):
        cand_t = _patches_candidates(
            feat_grid, out_h, out_w, qstride, kernel_size
        )  # (B, N, C, khw)
        zero_pix = jnp.broadcast_to(
            feat_grid[:, 0, 0, :].reshape(B, 1, C, 1), (B, N, C, 1)
        )
        cand_t = jnp.concatenate([cand_t, zero_pix], axis=3)
        idx = args[:, :, None, :]  # (B, N, 1, K)
        picked = jnp.take_along_axis(cand_t, idx, axis=3)  # (B, N, C, K)
        return jnp.swapaxes(picked, 2, 3)  # (B, N, K, C)
    if candidates is None:
        candidates, _ = window_candidates(
            feat_grid, out_h, out_w, qstride, stride, kernel_size, shift
        )
    zero_pix = jnp.broadcast_to(
        feat_grid[:, 0:1, 0:1, :].reshape(B, 1, 1, -1),
        (B, N, 1, candidates.shape[-1]),
    )
    candidates = jnp.concatenate([candidates, zero_pix], axis=2)
    return jnp.take_along_axis(candidates, args[..., None], axis=2)


def select_window_features_multi(
    feat_grids: Sequence[jnp.ndarray],
    args: jnp.ndarray,
    **wargs,
) -> List[jnp.ndarray]:
    """select_window_features over several same-grid feature tensors.

    Deliberately per-tensor: a channel-concat "packed" variant (one
    candidate stack + gather for all grids) measured 30% SLOWER in the
    full proj step (fwd 110.6 vs 158.3 pairs/s, BASELINE.md round-4) —
    the concat forces XLA to materialize the packed (B,N,khw,C_total)
    candidate stack in HBM, while per-tensor selects fuse each candidate
    build into its consumer (same fusion-context lesson as the im2col
    builder). It was the BENCH_r03 proj regression; do not re-pack
    without a full-step A/B showing otherwise.
    """
    return [select_window_features(f, args, **wargs) for f in feat_grids]


def pixel_posinfo(B: int, H: int, W: int, intrinsic: jnp.ndarray) -> jnp.ndarray:
    """Normalized-plane coordinates of every pixel center: K^-1 @ [u, v, 1]
    (ref src/projectPN/utils.py:297-308 get_pixel_posinfo). Returns
    (B, H, W, 3)."""
    h = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    w = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    grid = jnp.stack([w, h, jnp.ones_like(w)], axis=-1).reshape(1, H * W, 3)
    grid = jnp.broadcast_to(grid, (B, H * W, 3))
    K_inv = jnp.linalg.inv(intrinsic.astype(jnp.float32))
    out = jnp.einsum("bij,bnj->bni", K_inv, grid,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(B, H, W, 3)
