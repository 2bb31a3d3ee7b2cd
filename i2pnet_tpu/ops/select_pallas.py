"""Pallas selection-multiplicity kernel for windowed grid selects (TPU).

Computes the per-slot selection multiplicities m (see
ops/dense_window.selection_multiplicity) for the PointNet-level window
select (stride (1,1), shift=True, copy=True — ref fused_conv_go.cu
semantics as implemented by ops/projection.window_neighbor_select_grid)
WITHOUT lax.top_k or one-hot histograms: the (khw, W) distance plane
stays in VMEM and K argmin-extraction passes run at register speed.
lax.top_k ties break toward the lowest slot index; the extraction loop
reproduces that exactly (min distance, then min slot id), so the
resulting multiset of selected slots — and therefore m — is identical.

Layout: the host wrapper pre-strides the query-subsampled candidate
columns into kw "dw-planes" (one static strided slice per horizontal
window offset), transposed
channel-major so the kernel reads rows of (C, lanes=queries) with no
relayout:

    planes (B, kw, 3, h2 + 2*(kh//2), Wp)   f32, zero row padding
    slot (dh, dw) candidates for out-row r = planes[dw, :, qh*r + dh, :]

Out-of-image rows are invalid (in_bounds), not clamped; the sentinel
slot khw collects all K mass for no-hit / invalid-center queries,
matching select_window_features' zero-pix gather convention.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["selection_multiplicity_pallas"]

_INVALID = 1.0e10  # matches ops.projection._INVALID_DIST


def _pad_lanes(w: int) -> int:
    return ((w + 127) // 128) * 128


def _sel_kernel(
    planes_ref, m_ref, *, out_h, qh, kh, kw, K, dist2, h2, to,
):
    """planes (1, kw, 3, h2p, Wp) -> m (1, to, khw+1, Wp) for one
    (batch, out-row-block) instance."""
    S = kh * kw
    Wp = planes_ref.shape[-1]
    rb = pl.program_id(1)

    # every intermediate stays >= 2-D (Mosaic-friendly): per-lane values
    # are (1, Wp) rows, per-slot stacks are (S[, +1], Wp)
    for r in range(to):
        orow = rb * to + r
        # center = slot (kh//2, kw//2): the query's own pixel.  Dynamic
        # row indices must slice the REF (Mosaic has no value-level
        # dynamic_slice), hence pl.dslice on the h2p axis.
        ctr = planes_ref[
            0, kw // 2, :, pl.dslice(orow * qh + kh // 2, 1), :
        ].reshape(3, Wp)
        ctr_valid = (
            ctr[0:1] * ctr[0:1] + ctr[1:2] * ctr[1:2] + ctr[2:3] * ctr[2:3]
        ) > 1e-10  # (1, Wp)

        d_rows = []
        for dh in range(kh):
            grow = orow * qh + dh  # padded row; grid row = grow - kh//2
            grid_row = grow - (kh // 2)
            row_ok = (grid_row >= 0) & (grid_row < h2)
            for dw in range(kw):
                cand = planes_ref[
                    0, dw, :, pl.dslice(grow, 1), :].reshape(3, Wp)
                dx = ctr[0:1] - cand[0:1]
                dy = ctr[1:2] - cand[1:2]
                dz = ctr[2:3] - cand[2:3]
                d = dx * dx + dy * dy + dz * dz  # (1, Wp)
                q_valid = (
                    cand[0:1] * cand[0:1] + cand[1:2] * cand[1:2]
                    + cand[2:3] * cand[2:3]
                ) > 1e-10
                ok = q_valid & (d <= dist2) & row_ok
                d_rows.append(
                    jnp.where(ok, jnp.maximum(d, 1e-10),
                              jnp.full_like(d, _INVALID)))
        D = jnp.concatenate(d_rows, axis=0)  # (S, Wp)

        sidx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        m = jnp.zeros((S + 1, Wp), jnp.float32)
        midx = jax.lax.broadcasted_iota(jnp.int32, (S + 1, 1), 0)
        hits = jnp.zeros((1, Wp), jnp.float32)
        nearest = jnp.full((1, Wp), S, jnp.int32)
        for k in range(K):
            dmin = jnp.min(D, axis=0, keepdims=True)  # (1, Wp)
            hit = dmin < _INVALID / 2
            win = jnp.min(
                jnp.where(D == dmin, sidx, S + 1), axis=0, keepdims=True
            )  # (1, Wp) first slot attaining the min
            if k == 0:
                nearest = jnp.where(hit, win, S)
            sel = (midx == win) & hit
            m = m + sel.astype(jnp.float32)
            hits = hits + hit.astype(jnp.float32)
            D = jnp.where((sidx == win) & hit, jnp.full_like(D, _INVALID), D)
        # copy-mode fill: remaining K-hits slots duplicate the nearest hit
        # (or the sentinel when there was no hit); invalid centers put all
        # K on the sentinel
        fill_idx = jnp.where(ctr_valid, nearest, S)
        fill_n = jnp.where(ctr_valid, jnp.float32(K) - hits, jnp.float32(K))
        m = jnp.where(ctr_valid, m, jnp.zeros_like(m))
        m = m + jnp.where(midx == fill_idx, fill_n, jnp.zeros_like(m))
        m_ref[0, r] = m


@functools.lru_cache(maxsize=None)
def _make_sel(B, out_h, out_w, qh, qw, kh, kw, K, dist2, h2, w2, interpret):
    """One instance per (batch, out-row block). The planes block is the
    whole grid (a few MB at these level shapes); Mosaic's block rules
    constrain only the two minor dims (S+1, Wp), so the row block `to`
    just has to divide out_h."""
    Wp = _pad_lanes(out_w)
    to = out_h
    # keep out block + planes + (S, Wp) temps comfortably under ~10M
    h2p = h2 + 2 * (kh // 2)
    planes_b = kw * 3 * h2p * Wp * 4
    while to > 1 and planes_b + to * (kh * kw + 1) * Wp * 4 > 8_000_000:
        to //= 2
    while out_h % to:
        to -= 1
    nb = out_h // to
    kern = functools.partial(
        _sel_kernel, out_h=out_h, qh=qh, kh=kh, kw=kw, K=K,
        dist2=dist2, h2=h2, to=to,
    )
    S = kh * kw
    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, kw, 3, h2p, Wp), lambda b, i: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, to, S + 1, Wp),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_h, S + 1, Wp), jnp.float32),
        interpret=interpret,
    ), Wp, to


def selection_multiplicity_pallas(
    xyz_pr: jnp.ndarray,
    *,
    out_h: int,
    out_w: int,
    qstride: Tuple[int, int],
    kernel_size: Tuple[int, int],
    K: int,
    distance: float,
    interpret: bool = False,
    raw_layout: bool = False,
) -> jnp.ndarray:
    """m (B, out_h*out_w, khw+1) for the stride-(1,1) shift+copy select.

    Equals selection_multiplicity(window_neighbor_select_grid(xyz_pr,
    xyz_pr, ..., copy=True)[0]) with top_k's tie order reproduced.

    raw_layout=True returns the kernel's native (B, out_h, khw+1, Wp)
    layout (pad lanes included) for consumers that keep it on-chip
    (ops/pointnet_pallas.py).
    """
    B, h2, w2, _ = xyz_pr.shape
    kh, kw = kernel_size
    qh, qw = qstride
    # dw-planes: channel-major, wrap-padded cols, one static strided slice
    # per horizontal offset; zero row padding top/bottom (rows are masked
    # invalid in-kernel, not clamped)
    g = jnp.transpose(xyz_pr, (0, 3, 1, 2))  # (B, 3, h2, w2)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (kw // 2, kw // 2)), mode="wrap")
    planes = jnp.stack(
        [
            jax.lax.slice(
                g, (0, 0, 0, dw),
                (B, 3, h2, dw + (out_w - 1) * qw + 1), (1, 1, 1, qw),
            )
            for dw in range(kw)
        ],
        axis=1,
    )  # (B, kw, 3, h2, out_w)
    Wp = _pad_lanes(out_w)
    planes = jnp.pad(
        planes,
        ((0, 0), (0, 0), (0, 0), (kh // 2, kh // 2), (0, Wp - out_w)),
    )
    call, Wp_, to = _make_sel(
        B, out_h, out_w, qh, qw, kh, kw, K, float(distance) ** 2, h2, w2,
        interpret,
    )
    m = call(planes)  # (B, out_h, S+1, Wp)
    if raw_layout:
        return m
    m = m[..., :out_w]  # crop pad lanes
    m = jnp.transpose(m, (0, 1, 3, 2)).reshape(
        B, out_h * out_w, kh * kw + 1)
    return m
