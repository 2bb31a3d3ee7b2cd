"""Training-mode fused RGB-encoder kernels (Pallas, TPU).

The train step is HBM-bound in the RGB encoder (BASELINE.md round-2
investigation: 80 GB accessed, 107 of 120 ms), and most of that traffic is
the 128-lane channel padding XLA applies to small-channel NHWC convs — the
same padding the eval-mode fused kernel (ops/conv_pallas.py) removes by
keeping activations in a dense merged ``(B, H, W*C)`` layout.

This module provides the merged-layout building blocks for TRAINING, where
BN uses batch statistics and everything must be differentiable:

- ``conv_phase``: 3x3 stride-1 pad-1 conv on the merged layout (the
  phase-packed MXU formulation of conv_pallas.py, without BN/pool).
  Used for the forward conv AND, with spatially-flipped transposed
  weights, for the backward's dL/dx (a transposed conv is the same conv).
- ``conv_phase_dw``: the weight gradient — accumulates the phase-packed
  ``dWp[kh] += X_window^T @ dY`` over grid tiles; ``unpack_dw`` folds the
  packed gradient back to ``(3, 3, cin, cout)`` (each w entry appears in
  P phase copies, so the adjoint is a sum over the p diagonal).
- ``bn_pool_apply`` / its backward kernel: per-lane scale/shift (the BN
  affine resolved OUTSIDE the kernel from batch stats, so XLA autodiff
  handles the stats coupling) -> LeakyReLU(0.1) -> bf16 cast -> 3x3
  max-pool. The backward reproduces XLA select_and_scatter's first-max
  (row-major window scan) tie routing so gradients match the native path.

Everything between the kernels (batch statistics, the BN backward's
reductions, scale/shift algebra) runs as plain XLA on merged-layout
tensors — elementwise + full-lane-width reductions with no padding — so
only the spatially-structured ops live in Pallas.

Semantics match nn/layers.py RGBEncoderStage (ref basicConv.py:6-20):
conv (bf16 in, f32 accum) + bias -> BN (batch stats, f32) ->
LeakyReLU(0.1) -> bf16 -> max-pool 3x3.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i2pnet_tpu.ops.conv_pallas import (
    _even_w_selector as _even_selector,
    _pad_cin,
    pack_block_weights,
)

__all__ = [
    "conv_phase",
    "conv_phase_dw",
    "unpack_dw",
    "flip_transpose_kernel",
    "pack_block_weights",
    "bn_pool",
    "conv_train",
    "fused_stage_train",
    "stage_supported_train",
]

_NEG = -3.0e38


def _pick_ht(H: int, ht: int) -> int:
    """Largest tile height <= ht dividing H with Mosaic-friendly rows."""
    ht = min(ht, H)
    while ht > 1:
        if H % ht == 0 and (ht % 8 == 0 or ht == H):
            return ht
        ht -= 1
    return H


def _build_windows(ext, rows, G, K, cin, Lx, M=128):
    """(rows, W*cin) ext rows -> (rows*G, K) phase windows.

    Each M-lane group g (M = P*cin, a multiple of 128) covers P
    w-positions; its conv window spans K = (P+2)*cin lanes: [left
    neighbour's last cin, the group, right neighbour's first cin].
    Lane rolls run in f32 (Mosaic rotates only 32-bit data);
    out-of-image w edges are zeroed.
    """
    ext32 = ext.astype(jnp.float32)
    ext = ext.astype(jnp.bfloat16)
    mid = ext.reshape(rows, G, M)
    left = pltpu.roll(ext32, cin, axis=1).reshape(rows, G, M)[
        :, :, :cin].astype(jnp.bfloat16)
    right = pltpu.roll(ext32, Lx - M, axis=1).reshape(rows, G, M)[
        :, :, :cin].astype(jnp.bfloat16)
    X = jnp.concatenate([left, mid, right], axis=2)  # (rows, G, K)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    edge = ((gidx == 0) & (kidx < cin)) | ((gidx == G - 1) & (kidx >= K - cin))
    X = jnp.where(edge, jnp.zeros_like(X), X)
    return X.reshape(rows * G, K)


def _conv_kernel(
    wp_ref, bias_ref, prev_ref, main_ref, next_ref, out_ref,
    *, H: int, W: int, cin: int, cout: int, ht: int, P: int,
):
    """(1, ht, W*cin) rows -> (1, ht, W*cout) conv rows (same-size conv)."""
    G = W // P
    K = (P + 2) * cin
    i = pl.program_id(1)
    row0 = i * ht
    rows = ht + 2

    ext = jnp.concatenate(
        [prev_ref[0, ht - 1:ht, :], main_ref[0], next_ref[0, 0:1, :]], axis=0)
    gx = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    ext = jnp.where((gx >= 0) & (gx < H), ext, jnp.zeros_like(ext))

    Xf = _build_windows(ext, rows, G, K, cin, W * cin, M=P * cin)

    acc = jnp.zeros((ht * G, P * cout), jnp.float32)
    for kh in range(3):
        acc = acc + jax.lax.dot_general(
            Xf[kh * G:(kh + ht) * G], wp_ref[kh],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc = acc + bias_ref[0]
    out_ref[0] = acc.reshape(ht, W * cout).astype(out_ref.dtype)


def conv_phase(
    x: jnp.ndarray,
    wp: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    H: int,
    W: int,
    cin: int,
    cout: int,
    ht: int = 16,
    out_dtype=jnp.bfloat16,
    P: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same-size 3x3 conv + bias on the merged layout.

    x: (B, H, W*cin) bf16 (cin must divide 128 — zero-pad first);
    wp: (3, K, P*cout) packed weights (pack_block_weights), bf16;
    bias: (1, P*cout) per-channel bias tiled P times, f32.
    P: w-phases per lane group; default max(128//cin, 128//cout) so both
    the input group width P*cin and output group width P*cout are lane
    multiples (cout < cin — the dx direction — needs the larger count).
    wp must be packed with the same P (shape-checked).
    Returns (B, H, W*cout) out_dtype.
    """
    if 128 % cin:
        raise ValueError(f"cin={cin} must divide 128")
    if P is None:
        P = max(128 // cin, 128 // cout)
    if (P * cin) % 128 or (P * cout) % 128 or W % P:
        raise ValueError(
            f"P={P} needs P*cin ({P * cin}) and P*cout ({P * cout}) to be "
            f"multiples of 128 and W ({W}) a multiple of P")
    if tuple(wp.shape) != (3, (P + 2) * cin, P * cout):
        raise ValueError(
            f"wp shape {tuple(wp.shape)} != (3, {(P + 2) * cin}, "
            f"{P * cout}); pack_block_weights must use the same P={P}")
    B = x.shape[0]
    ht = _pick_ht(H, ht)
    ni = H // ht
    grid = (B, ni)
    in_block = (1, ht, W * cin)

    def im_main(b, i):
        return (b, i, 0)

    def im_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def im_next(b, i):
        return (b, jnp.minimum(i + 1, ni - 1), 0)

    kern = functools.partial(
        _conv_kernel, H=H, W=W, cin=cin, cout=cout, ht=ht, P=P)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(wp.shape, lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_next, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, W * cout), im_main,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W * cout), out_dtype),
        interpret=interpret,
    )(wp, bias, x, x, x)


def flip_transpose_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, cin, cout) -> (3, 3, cout, cin) spatially flipped.

    conv_phase with this kernel applied to dL/dy computes dL/dx (the
    transposed conv of a same-size stride-1 pad-1 3x3 conv).
    """
    return jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))


def _dw_kernel(
    prev_ref, main_ref, next_ref, dy_ref, out_ref,
    *, H: int, W: int, cin: int, cout: int, ht: int, P: int,
):
    """Accumulate dWp[kh] += X_window^T @ dY over sequential grid tiles."""
    G = W // P
    K = (P + 2) * cin
    N = P * cout
    i = pl.program_id(1)
    b = pl.program_id(0)
    row0 = i * ht
    rows = ht + 2

    ext = jnp.concatenate(
        [prev_ref[0, ht - 1:ht, :], main_ref[0], next_ref[0, 0:1, :]], axis=0)
    gx = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    ext = jnp.where((gx >= 0) & (gx < H), ext, jnp.zeros_like(ext))
    Xf = _build_windows(ext, rows, G, K, cin, W * cin, M=P * cin)

    dy = dy_ref[0].reshape(ht * G, N).astype(jnp.bfloat16)

    @pl.when((b == 0) & (i == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    for kh in range(3):
        out_ref[kh] += jax.lax.dot_general(
            Xf[kh * G:(kh + ht) * G], dy,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def conv_phase_dw(
    x: jnp.ndarray,
    dy: jnp.ndarray,
    *,
    H: int,
    W: int,
    cin: int,
    cout: int,
    ht: int = 16,
    P: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed weight gradient dWp (3, K, P*cout) f32.

    x: (B, H, W*cin) bf16; dy: (B, H, W*cout) grad of the conv output.
    P as in conv_phase (P*cout must be a lane multiple for dy's reshape).
    """
    if 128 % cin:
        raise ValueError(f"cin={cin} must divide 128")
    if P is None:
        P = max(128 // cin, 128 // cout)
    if (P * cin) % 128 or (P * cout) % 128 or W % P:
        raise ValueError(
            f"P={P} needs P*cin ({P * cin}) and P*cout ({P * cout}) to be "
            f"multiples of 128 and W ({W}) a multiple of P")
    B = x.shape[0]
    K = (P + 2) * cin
    ht = _pick_ht(H, ht)
    ni = H // ht
    in_block = (1, ht, W * cin)

    def im_main(b, i):
        return (b, i, 0)

    def im_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def im_next(b, i):
        return (b, jnp.minimum(i + 1, ni - 1), 0)

    kern = functools.partial(
        _dw_kernel, H=H, W=W, cin=cin, cout=cout, ht=ht, P=P)
    return pl.pallas_call(
        kern,
        grid=(B, ni),
        in_specs=[
            pl.BlockSpec(in_block, im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_next, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, W * cout), im_main,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, K, P * cout), lambda b, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, K, P * cout), jnp.float32),
        interpret=interpret,
    )(x, x, x, dy)


def _bn_pool_kernel(
    sc_ref, sh_ref, sel_ref, prev_ref, main_ref, next_ref, out_ref,
    *, H: int, W: int, cout: int, stride: int, ht_out: int,
):
    """z = y*scale+shift -> LeakyReLU -> bf16 -> 3x3 max-pool (stride s).

    One tile: conv rows [row0, row0+ht_in) + 1-row halo -> out rows
    [row0/s, row0/s + ht_out).
    """
    L = W * cout
    ht_in = ht_out * stride
    i = pl.program_id(1)
    row0 = i * ht_in
    rows = ht_in + 2

    y = jnp.concatenate(
        [prev_ref[0, ht_in - 1:ht_in, :], main_ref[0], next_ref[0, 0:1, :]],
        axis=0)
    z = y.astype(jnp.float32) * sc_ref[0] + sh_ref[0]
    a = jnp.where(z >= 0, z, 0.1 * z).astype(jnp.bfloat16).astype(jnp.float32)
    gr = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    a = jnp.where((gr >= 0) & (gr < H), a, jnp.full_like(a, _NEG))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    wl = jnp.where(lane >= cout, pltpu.roll(a, cout, axis=1),
                   jnp.full_like(a, _NEG))
    wr = jnp.where(lane < L - cout, pltpu.roll(a, L - cout, axis=1),
                   jnp.full_like(a, _NEG))
    wmax = jnp.maximum(a, jnp.maximum(wl, wr))

    if stride == 1:
        out = jnp.maximum(
            wmax[0:ht_out],
            jnp.maximum(wmax[1:ht_out + 1], wmax[2:ht_out + 2]))
    else:
        half = rows // 2  # rows = 2*ht_out + 2 (even)
        paired = wmax.reshape(half, 2, L)
        ev, od = paired[:, 0, :], paired[:, 1, :]
        out = jnp.maximum(
            ev[0:ht_out], jnp.maximum(od[0:ht_out], ev[1:ht_out + 1]))
        out = out.astype(jnp.bfloat16)
        m = out.reshape(ht_out * (L // 256), 256)
        out = jax.lax.dot_general(
            m, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ht_out, L // 2)
    out_ref[0] = out.astype(jnp.bfloat16)


def _bn_pool_fwd_p(y, sc_lane, sh_lane, *, H, W, cout, stride, ht_out,
                   interpret):
    B = y.shape[0]
    Ho = H // stride
    ht_out = _pick_ht(Ho, ht_out)
    # the input tile ht_in = ht_out*stride also satisfies Mosaic's row
    # rules automatically: _pick_ht returns ht_out % 8 == 0 (then ht_in
    # is a multiple of 8 for stride 1/2) or ht_out == Ho (then ht_in == H)
    ht_in = ht_out * stride
    ni = H // ht_in
    in_block = (1, ht_in, W * cout)
    sel = jnp.asarray(_even_selector(cout), jnp.bfloat16)

    def im_main(b, i):
        return (b, i, 0)

    def im_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def im_next(b, i):
        return (b, jnp.minimum(i + 1, ni - 1), 0)

    kern = functools.partial(
        _bn_pool_kernel, H=H, W=W, cout=cout, stride=stride, ht_out=ht_out)
    return pl.pallas_call(
        kern,
        grid=(B, ni),
        in_specs=[
            pl.BlockSpec(sc_lane.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sh_lane.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sel.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_next, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht_out, (W // stride) * cout), im_main,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, Ho, (W // stride) * cout), jnp.bfloat16),
        interpret=interpret,
    )(sc_lane, sh_lane, sel, y, y, y)


def _bn_pool_bwd_kernel(
    sc_ref, sh_ref, sel_ref, selT_ref,
    yp_ref, ym_ref, yn_ref, gp_ref, gm_ref, gn_ref, dz_ref,
    *, H: int, W: int, cout: int, stride: int, htc: int,
):
    """dz for conv rows [row0, row0+htc) from grad-of-out, first-max ties.

    Recomputes a = bf16(LeakyReLU(y*scale+shift)) for conv rows
    [row0-4, row0+htc+4), the pooled out values for out rows
    [o0-1, o0+ho+1), then routes each out grad to the first (row-major
    (kh, kw) scan) window position attaining the max — matching XLA
    select_and_scatter — and accumulates onto the conv grid.
    """
    L = W * cout
    Lo = (W // stride) * cout
    ho = htc // stride
    i = pl.program_id(1)
    row0 = i * htc
    o0 = row0 // stride
    rows = htc + 8  # conv rows [row0-4, row0+htc+4)
    Ho = H // stride

    # recompute a on the extended conv grid
    y = jnp.concatenate(
        [yp_ref[0, htc - 4:htc, :], ym_ref[0], yn_ref[0, 0:4, :]], axis=0)
    z = y.astype(jnp.float32) * sc_ref[0] + sh_ref[0]
    a = jnp.where(z >= 0, z, 0.1 * z).astype(jnp.bfloat16).astype(jnp.float32)
    gr = row0 - 4 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    a = jnp.where((gr >= 0) & (gr < H), a, jnp.full_like(a, _NEG))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

    # out grads on out rows [o0-1, o0+ho+1)
    go = jnp.concatenate(
        [gp_ref[0, ho - 1:ho, :], gm_ref[0], gn_ref[0, 0:1, :]], axis=0)
    go = go.astype(jnp.float32)
    gor = o0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (ho + 2, 1), 0)
    go = jnp.where((gor >= 0) & (gor < Ho), go, jnp.zeros_like(go))
    no = ho + 2

    # the three lane-rolled copies of a, shared by the pooled-value
    # recompute AND all 9 routing taps (per-tap rolls dominated VMEM)
    t_m1 = jnp.where(lane >= cout, pltpu.roll(a, cout, axis=1),
                     jnp.full_like(a, _NEG))       # value from w-1 (kw=0)
    t_p1 = jnp.where(lane < L - cout, pltpu.roll(a, L - cout, axis=1),
                     jnp.full_like(a, _NEG))       # value from w+1 (kw=2)
    t_by_kw = (t_m1, a, t_p1)

    def tap(kh, kw):
        """a at conv position (o*s + kh - 1, w_out*s + kw - 1, c) for the
        no out rows starting at o0-1, as an (no, Lo) array."""
        t = t_by_kw[kw]
        # rows: conv row (o*s + kh - 1) for o = o0-1 .. o0+ho; relative to
        # a's first row (row0-4): base for o = o0-1 is kh + 3 - s
        base = kh + 3 - stride
        if stride == 1:
            return t[base:base + no]
        # rows base, base+2, ...: pair rows, pick the parity, then compact
        # even-w lanes via the selection matmul (exact for bf16 values;
        # -NEG pad only lands on dropped odd-w lanes)
        tb = t[base:base + 2 * no].reshape(no, 2, L)[:, 0, :]
        m = tb.astype(jnp.bfloat16).reshape(no * (L // 256), 256)
        return jax.lax.dot_general(
            m, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(no, Lo)

    # pooled values on the out halo rows, forward-style (3 maxes over the
    # shared rolled buffers instead of materializing all 9 taps)
    wmax = jnp.maximum(a, jnp.maximum(t_m1, t_p1))  # (rows, L)
    if stride == 1:
        # out row j (abs o0-1+j) <- conv rows at a-indices j+2, j+3, j+4
        out_val = jnp.maximum(
            wmax[2:2 + no],
            jnp.maximum(wmax[3:3 + no], wmax[4:4 + no]))
    else:
        # out row j <- a-indices 2j+1, 2j+2, 2j+3; pair rows by parity
        half = rows // 2
        paired = wmax.reshape(half, 2, L)
        ev, od = paired[:, 0, :], paired[:, 1, :]
        m = jnp.maximum(
            od[0:no], jnp.maximum(ev[1:1 + no], od[1:1 + no]))
        mb = m.astype(jnp.bfloat16).reshape(no * (L // 256), 256)
        out_val = jax.lax.dot_general(
            mb, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(no, Lo)

    taps = [(kh, kw) for kh in range(3) for kw in range(3)]

    if stride == 1:
        dz_acc = jnp.zeros((htc, L), jnp.float32)
    else:
        # parity-split accumulators; interleaved once at the end (building
        # the interleave inside the loop cost ~3 (htc, L) temps per tap)
        dz_ev = jnp.zeros((htc // 2, L), jnp.float32)
        dz_od = jnp.zeros((htc // 2, L), jnp.float32)
    seen = jnp.zeros((no, Lo), jnp.float32)  # 1.0 once a tie was routed
    for kh, kw in taps:
        t = tap(kh, kw)
        m = (t == out_val) & (t > _NEG / 2)
        first = jnp.where(m, 1.0 - seen, 0.0)
        seen = seen + first
        contrib = go * first  # (no, Lo)
        # scatter back to the conv grid: lane expand (s=2) + roll, row place
        if stride == 2:
            cb = contrib.astype(jnp.float32)
            m2 = cb.reshape(no * (Lo // 128), 128)
            c_exp = jax.lax.dot_general(
                m2, selT_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(no, L)
        else:
            c_exp = contrib
        off = kw - 1
        if off > 0:
            c_exp = jnp.where(lane >= off * cout,
                              pltpu.roll(c_exp, off * cout, axis=1),
                              jnp.zeros_like(c_exp))
        elif off < 0:
            c_exp = jnp.where(lane < L - cout,
                              pltpu.roll(c_exp, L - cout, axis=1),
                              jnp.zeros_like(c_exp))
        # rows: out row o -> conv row o*s + kh - 1; keep rows in
        # [row0, row0+htc): relative conv row = (o - o0)*s + kh - 1
        def place(src, n_rows, lo, hi, at, L=L):
            """src[lo:hi] placed at rows [at, at+hi-lo) of an n_rows zeros
            array, via static concatenation (no scatter in-kernel)."""
            parts = []
            if at > 0:
                parts.append(jnp.zeros((at, L), jnp.float32))
            parts.append(src[lo:hi])
            tail = n_rows - at - (hi - lo)
            if tail > 0:
                parts.append(jnp.zeros((tail, L), jnp.float32))
            return parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=0)

        if stride == 1:
            # o index j (0..no-1) -> conv row j + kh - 2 relative to row0
            sh = kh - 2
            lo = max(0, -sh)
            hi = min(no, htc - sh)
            dz_acc = dz_acc + place(c_exp, htc, lo, hi, lo + sh)
        else:
            # out index j -> conv row r = 2j + kh - 3 relative to row0;
            # accumulate into the parity half
            sh = kh - 3  # r = 2j + sh
            jlo = max(0, (-sh + 1) // 2)
            jhi = min(no, (htc - sh + 1) // 2)
            half = htc // 2
            if sh % 2 == 0:
                dz_ev = dz_ev + place(
                    c_exp, half, jlo, jhi, (2 * jlo + sh) // 2)
            else:
                dz_od = dz_od + place(
                    c_exp, half, jlo, jhi, (2 * jlo + sh - 1) // 2)

    if stride == 2:
        dz_acc = jnp.concatenate(
            [dz_ev[:, None, :], dz_od[:, None, :]], axis=1).reshape(htc, L)

    # dz = da * lrelu'(z) on the main rows; z for main rows is a[4:4+htc]
    zmain = (ym_ref[0].astype(jnp.float32) * sc_ref[0] + sh_ref[0])
    dz_ref[0] = dz_acc * jnp.where(zmain >= 0, 1.0, 0.1)


def _bn_pool_bwd_p(y, sc_lane, sh_lane, g, *, H, W, cout, stride, htc,
                   interpret):
    B = y.shape[0]
    L = W * cout
    Lo = (W // stride) * cout
    htc = _pick_bwd_tile(H, L, stride, htc)
    if htc is None:
        raise ValueError(
            f"no valid pool-backward tile for H={H}, L={L}, stride={stride}")
    ho = htc // stride
    ni = H // htc
    sel = jnp.asarray(_even_selector(cout), jnp.bfloat16)
    selT = jnp.asarray(_even_selector(cout).T, jnp.float32)

    def im_main(b, i):
        return (b, i, 0)

    def im_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def im_next(b, i):
        return (b, jnp.minimum(i + 1, ni - 1), 0)

    kern = functools.partial(
        _bn_pool_bwd_kernel, H=H, W=W, cout=cout, stride=stride, htc=htc)
    return pl.pallas_call(
        kern,
        grid=(B, ni),
        in_specs=[
            pl.BlockSpec(sc_lane.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sh_lane.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sel.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(selT.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, htc, L), im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, htc, L), im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, htc, L), im_next, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, Lo), im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, Lo), im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, Lo), im_next, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, htc, L), im_main,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, L), jnp.float32),
        interpret=interpret,
    )(sc_lane, sh_lane, sel, selT, y, y, y, g, g, g)


def _bn_pool_native_merged(y, sc_lane, sh_lane, *, H, W, cout, stride):
    """Differentiable native-XLA bn_pool on the merged (B, H, W*cout)
    layout: scale/shift -> LeakyReLU -> bf16 -> 3x3/stride max-pool built
    from pad/slice lane+row shifts, a max tree, and strided subsampling.

    Forward values bit-match the Pallas kernel (same max sets, same bf16
    cast point). Used as the BACKWARD formulation for blocks where the
    Pallas routing kernel exceeds the 16M scoped-VMEM limit: everything
    stays dense (no 128-lane channel padding) and XLA autodiffs it. Tie
    gradients split evenly across tied window slots (jnp.maximum
    convention) instead of select_and_scatter's first-max — an equally
    valid subgradient; documented divergence from the reference on exact
    bf16 ties only.
    """
    B = y.shape[0]
    L = W * cout
    neg = jnp.float32(_NEG)
    z = y.astype(jnp.float32) * sc_lane + sh_lane
    a = jnp.where(z >= 0, z, 0.1 * z)
    # straight-through bf16 rounding: primal values match the Pallas
    # forward's cast, but the cotangent stays f32 (a plain astype would
    # round dz to bf16 mid-chain; the Pallas backward keeps f32)
    a = a + jax.lax.stop_gradient(
        a.astype(jnp.bfloat16).astype(jnp.float32) - a)
    wl = jnp.pad(a[:, :, :-cout], ((0, 0), (0, 0), (cout, 0)),
                 constant_values=neg)
    wr = jnp.pad(a[:, :, cout:], ((0, 0), (0, 0), (0, cout)),
                 constant_values=neg)
    wmax = jnp.maximum(a, jnp.maximum(wl, wr))
    up = jnp.pad(wmax[:, :-1], ((0, 0), (1, 0), (0, 0)),
                 constant_values=neg)
    dn = jnp.pad(wmax[:, 1:], ((0, 0), (0, 1), (0, 0)),
                 constant_values=neg)
    rmax = jnp.maximum(wmax, jnp.maximum(up, dn))
    out = rmax[:, ::stride, :]
    if stride == 2:
        Ho = H // 2
        out = out.reshape(B, Ho, W, cout)[:, :, ::2, :].reshape(
            B, Ho, (W // 2) * cout)
    return out.astype(jnp.bfloat16)


def _bn_pool_fwd_idx_kernel(
    sc_ref, sh_ref, sel_ref, prev_ref, main_ref, next_ref, out_ref, idx_ref,
    *, H: int, W: int, cout: int, stride: int, ht_out: int,
):
    """The training-forward twin of ``_bn_pool_kernel``: emits the pooled
    output (bit-identical max tree) PLUS the winning tap index per out
    cell — first max in row-major (kh, kw) scan order, i.e. exactly the
    routing XLA select_and_scatter and ``_bn_pool_bwd_kernel`` use. The
    saved plane turns the backward into a pure 9-tap routed accumulation
    with no activation recompute (round-4f)."""
    L = W * cout
    ht_in = ht_out * stride
    i = pl.program_id(1)
    row0 = i * ht_in
    rows = ht_in + 2

    y = jnp.concatenate(
        [prev_ref[0, ht_in - 1:ht_in, :], main_ref[0], next_ref[0, 0:1, :]],
        axis=0)
    z = y.astype(jnp.float32) * sc_ref[0] + sh_ref[0]
    a = jnp.where(z >= 0, z, 0.1 * z).astype(jnp.bfloat16).astype(jnp.float32)
    gr = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    a = jnp.where((gr >= 0) & (gr < H), a, jnp.full_like(a, _NEG))

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    wl = jnp.where(lane >= cout, pltpu.roll(a, cout, axis=1),
                   jnp.full_like(a, _NEG))
    wr = jnp.where(lane < L - cout, pltpu.roll(a, L - cout, axis=1),
                   jnp.full_like(a, _NEG))
    t_by_kw = (wl, a, wr)

    # pooled out: the exact max tree of _bn_pool_kernel (bit-identical)
    wmax = jnp.maximum(a, jnp.maximum(wl, wr))
    if stride == 1:
        out = jnp.maximum(
            wmax[0:ht_out],
            jnp.maximum(wmax[1:ht_out + 1], wmax[2:ht_out + 2]))
    else:
        half = rows // 2
        paired = wmax.reshape(half, 2, L)
        ev, od = paired[:, 0, :], paired[:, 1, :]
        out = jnp.maximum(
            ev[0:ht_out], jnp.maximum(od[0:ht_out], ev[1:ht_out + 1]))
        out = out.astype(jnp.bfloat16)
        m = out.reshape(ht_out * (L // 256), 256)
        out = jax.lax.dot_general(
            m, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ht_out, L // 2)
    out_ref[0] = out.astype(jnp.bfloat16)

    # winning tap index, first-max in row-major (kh, kw) order: strict >
    # updates keep the FIRST tap attaining the running (= global) max
    def tap(kh, kw):
        t = t_by_kw[kw]
        if stride == 1:
            return t[kh:kh + ht_out]
        p = t.reshape(rows // 2, 2, L)
        if kh == 0:
            return p[0:ht_out, 0, :]
        if kh == 1:
            return p[0:ht_out, 1, :]
        return p[1:ht_out + 1, 0, :]

    best = tap(0, 0)
    idx = jnp.zeros((ht_out, L), jnp.float32)
    k = 0
    for kh in range(3):
        for kw in range(3):
            if k == 0:
                k += 1
                continue
            t = tap(kh, kw)
            upd = t > best
            idx = jnp.where(upd, jnp.float32(k), idx)
            best = jnp.maximum(best, t)
            k += 1
    if stride == 2:
        mi = idx.astype(jnp.bfloat16).reshape(ht_out * (L // 256), 256)
        idx = jax.lax.dot_general(
            mi, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ht_out, L // 2)
    idx_ref[0] = idx.astype(jnp.bfloat16)


def _pick_idx_fwd_ht(Ho, L, stride, ht):
    """Tile height for the idx forward: the scan adds two (ht_out, L)
    f32 temps (best, idx) on top of the plain forward's four
    (rows, L)-scale buffers, so cap the tile to keep ~(4*stride+2)*ht
    f32 rows of L under the scoped-VMEM budget."""
    cap = max(1, 11_000_000 // ((4 * stride + 3) * L * 4))
    return _pick_ht(Ho, min(ht, cap))


def _bn_pool_fwd_idx_p(y, sc_lane, sh_lane, *, H, W, cout, stride, ht_out,
                       interpret):
    B = y.shape[0]
    Ho = H // stride
    L = W * cout
    Lo = (W // stride) * cout
    ht_out = _pick_idx_fwd_ht(Ho, L, stride, ht_out)
    ht_in = ht_out * stride
    ni = H // ht_in
    in_block = (1, ht_in, L)
    sel = jnp.asarray(_even_selector(cout), jnp.bfloat16)

    def im_main(b, i):
        return (b, i, 0)

    def im_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def im_next(b, i):
        return (b, jnp.minimum(i + 1, ni - 1), 0)

    kern = functools.partial(
        _bn_pool_fwd_idx_kernel, H=H, W=W, cout=cout, stride=stride,
        ht_out=ht_out)
    return pl.pallas_call(
        kern,
        grid=(B, ni),
        in_specs=[
            pl.BlockSpec(sc_lane.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sh_lane.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sel.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_next, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ht_out, Lo), im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht_out, Lo), im_main, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ho, Lo), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, Ho, Lo), jnp.bfloat16),
        ],
        interpret=interpret,
    )(sc_lane, sh_lane, sel, y, y, y)


def _bn_pool_bwd_idx_kernel(
    sc_ref, sh_ref, selT_ref, ym_ref,
    ip_ref, im_ref, in_ref, gp_ref, gm_ref, gn_ref, *out_refs,
    H: int, W: int, cout: int, stride: int, htc: int,
):
    """dz from the forward-saved tap-index plane: route each out grad to
    its recorded winner — no activation/out_val recompute, so the VMEM
    stack is a fraction of ``_bn_pool_bwd_kernel``'s and fits the wide
    stage-1 blocks that previously fell back to select-and-scatter."""
    L = W * cout
    Lo = (W // stride) * cout
    ho = htc // stride
    i = pl.program_id(1)
    row0 = i * htc
    o0 = row0 // stride
    Ho = H // stride
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

    # out grads + winner indices on out rows [o0-1, o0+ho+1)
    go = jnp.concatenate(
        [gp_ref[0, ho - 1:ho, :], gm_ref[0], gn_ref[0, 0:1, :]], axis=0)
    go = go.astype(jnp.float32)
    gor = o0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (ho + 2, 1), 0)
    go = jnp.where((gor >= 0) & (gor < Ho), go, jnp.zeros_like(go))
    # f32 for the per-tap equality tests: Mosaic has no bf16 cmpf on v5e
    oidx = jnp.concatenate(
        [ip_ref[0, ho - 1:ho, :], im_ref[0], in_ref[0, 0:1, :]],
        axis=0).astype(jnp.float32)
    no = ho + 2

    taps = [(kh, kw) for kh in range(3) for kw in range(3)]
    if stride == 1:
        dz_acc = jnp.zeros((htc, L), jnp.float32)
    else:
        dz_ev = jnp.zeros((htc // 2, L), jnp.float32)
        dz_od = jnp.zeros((htc // 2, L), jnp.float32)
    for k, (kh, kw) in enumerate(taps):
        contrib = go * (oidx == jnp.float32(k)).astype(jnp.float32)
        if stride == 2:
            m2 = contrib.reshape(no * (Lo // 128), 128)
            c_exp = jax.lax.dot_general(
                m2, selT_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(no, L)
        else:
            c_exp = contrib
        off = kw - 1
        if off > 0:
            c_exp = jnp.where(lane >= off * cout,
                              pltpu.roll(c_exp, off * cout, axis=1),
                              jnp.zeros_like(c_exp))
        elif off < 0:
            c_exp = jnp.where(lane < L - cout,
                              pltpu.roll(c_exp, L - cout, axis=1),
                              jnp.zeros_like(c_exp))

        def place(src, n_rows, lo, hi, at, L=L):
            parts = []
            if at > 0:
                parts.append(jnp.zeros((at, L), jnp.float32))
            parts.append(src[lo:hi])
            tail = n_rows - at - (hi - lo)
            if tail > 0:
                parts.append(jnp.zeros((tail, L), jnp.float32))
            return parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=0)

        if stride == 1:
            sh = kh - 2
            lo = max(0, -sh)
            hi = min(no, htc - sh)
            dz_acc = dz_acc + place(c_exp, htc, lo, hi, lo + sh)
        else:
            sh = kh - 3
            jlo = max(0, (-sh + 1) // 2)
            jhi = min(no, (htc - sh + 1) // 2)
            half = htc // 2
            if sh % 2 == 0:
                dz_ev = dz_ev + place(
                    c_exp, half, jlo, jhi, (2 * jlo + sh) // 2)
            else:
                dz_od = dz_od + place(
                    c_exp, half, jlo, jhi, (2 * jlo + sh - 1) // 2)

    if stride == 2:
        dz_acc = jnp.concatenate(
            [dz_ev[:, None, :], dz_od[:, None, :]], axis=1).reshape(htc, L)

    ymf = ym_ref[0].astype(jnp.float32)
    zmain = ymf * sc_ref[0] + sh_ref[0]
    out_refs[0][0] = dz_acc * jnp.where(zmain >= 0, 1.0, 0.1)


def _bn_pool_bwd_idx_p(y, sc_lane, sh_lane, idx, g, *, H, W, cout, stride,
                       htc, interpret):
    B = y.shape[0]
    L = W * cout
    Lo = (W // stride) * cout
    # the routing-only stack holds ~4-5 (htc, L) f32 temps at peak (vs
    # ~10 (htc+8, L) for the recompute kernel), so the tile cap is looser
    htc = _pick_bwd_tile(H, L, stride, htc, cap=max(4, 650_000 // L))
    if htc is None:
        raise ValueError(
            f"no valid pool-backward tile for H={H}, L={L}, stride={stride}")
    ho = htc // stride
    ni = H // htc
    selT = jnp.asarray(_even_selector(cout).T, jnp.float32)

    def im_main(b, i):
        return (b, i, 0)

    def im_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def im_next(b, i):
        return (b, jnp.minimum(i + 1, ni - 1), 0)

    kern = functools.partial(
        _bn_pool_bwd_idx_kernel, H=H, W=W, cout=cout, stride=stride, htc=htc)
    out_specs = pl.BlockSpec((1, htc, L), im_main, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, H, L), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(B, ni),
        in_specs=[
            pl.BlockSpec(sc_lane.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sh_lane.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(selT.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, htc, L), im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, Lo), im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, Lo), im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, Lo), im_next, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, Lo), im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, Lo), im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho, Lo), im_next, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(sc_lane, sh_lane, selT, y, idx, idx, idx, g, g, g)


def _pick_bwd_tile(H, L, stride, htc, cap=None):
    """The conv-row tile height _bn_pool_bwd_p will actually use.

    Mosaic block rule: rows divisible by 8 or equal to the full
    dimension, for BOTH the conv blocks (tile rows) and the pooled-grad
    blocks (tile//stride rows). The VMEM cap is a soft preference (the
    routing loop holds several (tile, L)-scale f32 temps; at L=20480 a
    16-row tile measured 18.75M before the forward-style out_val
    rewrite) — if no legal tile fits the cap, the smallest legal one is
    used anyway. Returns None when no legal tile exists.
    """
    Ho_ = H // stride
    if cap is None:
        cap = max(4, 250_000 // L)
    valid = [
        c for c in range(4, H + 1)
        if H % c == 0 and c % stride == 0
        and (c % 8 == 0 or c == H)
        and ((c // stride) % 8 == 0 or c // stride == Ho_)
    ]
    if not valid:
        return None
    within = [c for c in valid if c <= min(htc, cap)]
    return max(within) if within else min(valid)


@functools.lru_cache(maxsize=None)
def _make_bn_pool(H, W, cout, stride, ht_out, htc, interpret, bwd):
    """custom_vjp'd (y, scale_c, shift_c) -> pooled out for fixed shapes.

    y: (B, H, W*cout) bf16 conv output (bias included);
    scale_c/shift_c: (cout,) f32 — the BN affine RESOLVED from batch
    statistics outside (so XLA autodiff propagates the stats coupling).
    out: (B, H//stride, (W//stride)*cout) bf16.
    """

    def fwd_only(y, scale_c, shift_c):
        sc = jnp.tile(scale_c, W)[None, :]
        sh = jnp.tile(shift_c, W)[None, :]
        return _bn_pool_fwd_p(
            y, sc, sh, H=H, W=W, cout=cout, stride=stride, ht_out=ht_out,
            interpret=interpret)

    @jax.custom_vjp
    def f(y, scale_c, shift_c):
        return fwd_only(y, scale_c, shift_c)

    def f_fwd(y, scale_c, shift_c):
        return fwd_only(y, scale_c, shift_c), (y, scale_c, shift_c)

    def f_bwd_pallas(res, g):
        y, scale_c, shift_c = res
        sc = jnp.tile(scale_c, W)[None, :]
        sh = jnp.tile(shift_c, W)[None, :]
        dz = _bn_pool_bwd_p(
            y, sc, sh, g, H=H, W=W, cout=cout, stride=stride, htc=htc,
            interpret=interpret)
        dy = (dz * sc).astype(y.dtype)
        yf = y.astype(jnp.float32)
        dsc = jnp.sum(dz * yf, axis=(0, 1)).reshape(W, cout).sum(0)
        dsh = jnp.sum(dz, axis=(0, 1)).reshape(W, cout).sum(0)
        return dy, dsc, dsh

    def f_bwd_native(res, g):
        y, scale_c, shift_c = res
        sc = jnp.tile(scale_c, W)[None, :]
        sh = jnp.tile(shift_c, W)[None, :]
        _, vjp = jax.vjp(
            lambda yy, a, b: _bn_pool_native_merged(
                yy, a, b, H=H, W=W, cout=cout, stride=stride),
            y, sc, sh)
        dy, dsc_l, dsh_l = vjp(g.astype(jnp.bfloat16))
        return (
            dy.astype(y.dtype),
            dsc_l.reshape(W, cout).sum(0),
            dsh_l.reshape(W, cout).sum(0),
        )

    def f_bwd_sas(res, g):
        # XLA autodiff of the UNMERGED reduce_window formulation: the pool
        # VJP lowers to native select-and-scatter — round-2's measured-
        # fastest pool backward (41.4 ms vs 68-427 ms for every
        # alternative, BASELINE.md) — and routes tie gradients first-max,
        # matching the Pallas backward (the merged max-tree splits ties
        # evenly instead). The merged (B, H, W*cout) buffer is channel-
        # fastest, so the reshape to (B, H, W, cout) is layout-free.
        y, scale_c, shift_c = res
        B = y.shape[0]

        def pool_unmerged(yy, sc_c, sh_c):
            z = yy.reshape(B, H, W, cout).astype(jnp.float32) * sc_c + sh_c
            a = jnp.where(z >= 0, z, 0.1 * z)
            # straight-through bf16 rounding: primal max sets match the
            # Pallas forward's cast, cotangent stays f32
            a = a + jax.lax.stop_gradient(
                a.astype(jnp.bfloat16).astype(jnp.float32) - a)
            out = jax.lax.reduce_window(
                a, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                (1, stride, stride, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)))
            return out.reshape(
                B, H // stride, (W // stride) * cout).astype(jnp.bfloat16)

        _, vjp = jax.vjp(pool_unmerged, y, scale_c, shift_c)
        dy, dsc, dsh = vjp(g.astype(jnp.bfloat16))
        return dy.astype(y.dtype), dsc, dsh

    def f_fwd_idx(y, scale_c, shift_c):
        # forward twin that also records the winning tap per out cell
        # (first-max, row-major — the select_and_scatter order); the out
        # values come from the identical max tree, so the primal is
        # bit-equal to fwd_only
        sc = jnp.tile(scale_c, W)[None, :]
        sh = jnp.tile(shift_c, W)[None, :]
        out, idx = _bn_pool_fwd_idx_p(
            y, sc, sh, H=H, W=W, cout=cout, stride=stride, ht_out=ht_out,
            interpret=interpret)
        return out, (y, scale_c, shift_c, idx)

    def f_bwd_idx(res, g):
        y, scale_c, shift_c, idx = res
        sc = jnp.tile(scale_c, W)[None, :]
        sh = jnp.tile(shift_c, W)[None, :]
        dz = _bn_pool_bwd_idx_p(
            y, sc, sh, idx, g, H=H, W=W, cout=cout, stride=stride, htc=htc,
            interpret=interpret)
        dy = (dz * sc).astype(y.dtype)
        yf = y.astype(jnp.float32)
        dsc = jnp.sum(dz * yf, axis=(0, 1)).reshape(W, cout).sum(0)
        dsh = jnp.sum(dz, axis=(0, 1)).reshape(W, cout).sum(0)
        return dy, dsc, dsh

    if bwd == "idx":
        f.defvjp(f_fwd_idx, f_bwd_idx)
        return f
    bwd_fn = {"native": f_bwd_native, "sas": f_bwd_sas}.get(bwd, f_bwd_pallas)
    f.defvjp(f_fwd, bwd_fn)
    return f


def bn_pool(
    y: jnp.ndarray,
    scale_c: jnp.ndarray,
    shift_c: jnp.ndarray,
    *,
    H: int,
    W: int,
    cout: int,
    stride: int,
    ht_out: int = 16,
    htc: int = 16,
    interpret: bool = False,
    bwd: str = "auto",
) -> jnp.ndarray:
    """BN affine (per-channel scale/shift) -> LeakyReLU(0.1) -> bf16 ->
    3x3/stride max-pool on the merged layout, differentiable.

    bwd: "idx" (the default via "auto") — the forward saves the winning
    tap index per out cell (first-max, row-major — the select_and_scatter
    scan order) and the backward is a pure 9-tap routed accumulation: no
    activation recompute, so its VMEM stack fits EVERY block width.
    Measured (BASELINE.md round-4f): full free-point train step 86.0 ->
    67.7 ms — the recompute kernel's wide-block select-and-scatter
    fallback was the single largest cost in the whole backward.
    Verification backends, selectable via I2PNET_POOL_BWD: "pallas" —
    first-max routing with in-kernel activation recompute (bit-identical
    gradients to idx; scoped-VMEM-limited to narrow blocks); "native" —
    XLA autodiff of the merged max-tree (even tie split); "sas" — XLA
    autodiff of the unmerged reduce_window formulation (native
    select-and-scatter VJP; the pre-idx wide-block default).
    """
    if bwd == "auto":
        bwd = os.environ.get("I2PNET_POOL_BWD", "idx")
    f = _make_bn_pool(H, W, cout, stride, ht_out, htc, interpret, bwd)
    return f(y, scale_c.astype(jnp.float32), shift_c.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _make_conv_train(H, W, cin_l, cout, interpret):
    """custom_vjp'd merged-layout conv for fixed shapes.

    (x, w, b) -> y: x (B, H, W*cin_p) bf16 (cin_l zero-padded to cin_p
    lanes); w (3, 3, cin_l, cout) f32 param; b (cout,) f32. y bf16.
    Backward: dx via conv_phase with the flipped-transposed kernel
    (zero-padded back to cin_p output lanes), dw via conv_phase_dw +
    unpack_dw, db as the merged-lane channel sum of the cotangent.
    """
    cin_p = _pad_cin(cin_l)
    P = max(128 // cin_p, 128 // cout)
    cin_t = _pad_cin(cout)
    # dx emits cin_p channels; when cin_p < cout the phase count must grow
    # so the output group width P*cin_p stays a lane multiple
    Pt = max(128 // cin_t, 128 // cin_p)

    def fwd_only(x, w, b):
        wp = pack_block_weights(w, P=P).astype(jnp.bfloat16)
        return conv_phase(
            x, wp, jnp.tile(b, P)[None, :], H=H, W=W, cin=cin_p, cout=cout,
            P=P, interpret=interpret)

    @jax.custom_vjp
    def f(x, w, b):
        return fwd_only(x, w, b)

    def f_fwd(x, w, b):
        return fwd_only(x, w, b), (x, w)

    def f_bwd(res, g):
        x, w = res
        g = g.astype(jnp.bfloat16)
        B = g.shape[0]
        if cin_t != cout:
            g4 = g.reshape(B, H, W, cout)
            g_dx = jnp.pad(
                g4, ((0, 0),) * 3 + ((0, cin_t - cout),)).reshape(
                    B, H, W * cin_t)
        else:
            g_dx = g
        wt = flip_transpose_kernel(w)  # (3, 3, cout, cin_l)
        if cin_p != cin_l:
            wt = jnp.pad(wt, ((0, 0),) * 3 + ((0, cin_p - cin_l),))
        wpt = pack_block_weights(wt, P=Pt).astype(jnp.bfloat16)
        dx = conv_phase(
            g_dx, wpt, jnp.zeros((1, Pt * cin_p), jnp.float32),
            H=H, W=W, cin=cin_t, cout=cin_p, P=Pt, interpret=interpret)
        dwp = conv_phase_dw(
            x, g, H=H, W=W, cin=cin_p, cout=cout, P=P, interpret=interpret)
        dw = unpack_dw(dwp, cin_l, cout, P=P)
        db = g.astype(jnp.float32).sum((0, 1)).reshape(W, cout).sum(0)
        return dx, dw, db

    f.defvjp(f_fwd, f_bwd)
    return f


def conv_train(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    H: int,
    W: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable merged-layout 3x3 conv + bias (see _make_conv_train)."""
    cin_l, cout = int(w.shape[2]), int(w.shape[3])
    f = _make_conv_train(H, W, cin_l, cout, interpret)
    return f(x, w.astype(jnp.float32), b.astype(jnp.float32))


def stage_supported_train(
    H: int, W: int, cin: int, channels, strides,
) -> bool:
    """True if every block satisfies the TRAIN kernels' layout constraints:
    stride in {1, 2} dividing H and W; inter-block channel counts dividing
    128; W divisible by both the forward and dx phase counts; stride-2
    pooling needs (W*ch) % 256 == 0 (the even-w selection matmul) and the
    pool-backward tile slicing needs H >= 4 at every block."""
    for ch, s in zip(channels, strides):
        cin_p = _pad_cin(cin)
        if 128 % ch:
            return False
        Pf = max(128 // cin_p, 128 // ch)
        Pt = max(128 // ch, 128 // cin_p)
        if s not in (1, 2) or H % s or W % s or W % Pf or W % Pt or H < 4:
            return False
        if s == 2 and (W * ch) % 256:
            return False
        H, W, cin = H // s, W // s, ch
    return True


def fused_stage_train(
    x: jnp.ndarray,
    blocks,
    *,
    H: int,
    W: int,
    cin: int,
    channels,
    strides,
    eps: float = 1e-5,
    interpret: bool = False,
    axis_name=None,
):
    """One RGB-encoder stage, training mode, on the merged layout.

    x: (B, H, W, cin) (any float dtype); blocks: per-block
    (w, b, gamma, beta) with w (3, 3, cin_j, ch_j). Per block:
    conv_train -> batch statistics (f32, biased var — flax BatchNorm
    semantics over the bf16 conv output, matching the native path's
    ``x.astype(f32); batch_norm(train=True)``) -> bn_pool with the
    batch-resolved scale/shift. The stats coupling (d var/d y etc.) is
    plain XLA autodiff through the scale/shift algebra.

    axis_name: when run per-shard inside a ``jax.shard_map`` over a data-
    parallel mesh axis, psum the batch moments over that axis so the
    normalization (and its gradient) uses GLOBAL batch statistics —
    matching what GSPMD produces for the native path under a dp jit.

    Returns ((B, Ho, Wo, channels[-1]) bf16, [(mean_j, var_j) ...]).
    Ref semantics: basicConv.py:6-20 / train-mode BatchNorm2d.
    """
    B = x.shape[0]
    cin_p = _pad_cin(cin)
    if cin_p != cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin)))
    xm = x.reshape(B, H, W * cin_p).astype(jnp.bfloat16)
    stats = []
    for (w, b, gamma, beta), ch, s in zip(blocks, channels, strides):
        y = conv_train(xm, w, b, H=H, W=W, interpret=interpret)
        yf = y.astype(jnp.float32)
        n = B * H * W
        s1 = yf.sum((0, 1)).reshape(W, ch).sum(0)
        s2 = (yf * yf).sum((0, 1)).reshape(W, ch).sum(0)
        if axis_name is not None:
            s1 = jax.lax.psum(s1, axis_name)
            s2 = jax.lax.psum(s2, axis_name)
            n = n * jax.lax.psum(1, axis_name)
        mean = s1 / n
        mean2 = s2 / n
        var = mean2 - mean * mean
        sc = gamma.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
        sh = beta.astype(jnp.float32) - mean * sc
        xm = bn_pool(
            y, sc, sh, H=H, W=W, cout=ch, stride=s, interpret=interpret)
        stats.append((mean, var))
        H, W = H // s, W // s
    return xm.reshape(B, H, W, channels[-1]), stats


def unpack_dw(
    dwp: jnp.ndarray, cin: int, cout: int, P: int = None
) -> jnp.ndarray:
    """Adjoint of pack_block_weights: (3, K, P*cout) -> (3, 3, cin, cout).

    w[kh, kw, ci, co] appears at packed slots (r, p) with r = p + kw for
    every phase p, so its gradient is the sum over that diagonal.
    """
    cin_p = _pad_cin(cin)
    if P is None:
        P = max(128 // cin_p, 128 // cout)
    A = dwp.reshape(3, P + 2, cin_p, P, cout)
    rows = []
    for kw in range(3):
        # sum_p A[:, p + kw, :, p, :]
        terms = [A[:, p + kw, :, p, :] for p in range(P)]
        rows.append(functools.reduce(jnp.add, terms))
    dw = jnp.stack(rows, axis=1)  # (3, 3, cin_p, cout)
    return dw[:, :, :cin, :]
