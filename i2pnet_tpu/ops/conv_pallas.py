"""Fused RGB-encoder block kernel (Pallas, TPU).

One encoder block is ``3x3 conv (s1, pad 1) -> BN (eval: scale/shift) ->
LeakyReLU(0.1) -> 3x3 max-pool (stride s, pad 1)`` (ref basicConv.py:6-20,
rebuilt in nn/layers.py RGBEncoderStage). XLA's TPU conv pads the channel
dim to 128 lanes, so every stage-1 conv (C=16) pays 128-channel HBM traffic
— measured 7.5 of the encoder's 7.8 GB (tools/probe_free_hotspots.py), with
the encoder 13.1 ms of the 29.5 ms free-point forward.

This kernel removes the padding by keeping activations in a dense merged
layout ``(B, H, W*C)`` (minor dim ~10k lanes, no padding) and reformulating
the conv for the MXU with *phase packing*:

- Input lanes are viewed as 128-lane groups = ``P = 128 // cin`` w-positions
  x cin channels; each group's conv window spans ``K = (P + 2) * cin``
  lanes (built with two lane-rolls + a concat, all VMEM-local).
- The matmul N dim packs the P output phases x cout channels
  (``N = P * cout``, 128 or 256) so the MXU runs at full lane width.
- The 3x3 kernel's kh taps become 3 accumulated matmuls over row-shifted
  slices of one window tensor; the kw structure is folded into a
  zero-structured packed weight ``Wp[kh][(r, ci), (p, co)] = w[kh, r - p,
  ci, co]`` (zero unless 0 <= r - p <= 2), built once outside the kernel.
- A phase-packed output group's lanes are exactly the merged (w, c) layout
  (``lane = N*g + p*cout + co = w*cout + co``), so BN scale/shift,
  LeakyReLU and the 3x3 max-pool run directly on the merged form:
  w-neighbours are lane rolls by ±cout, h-neighbours are row slices, and
  stride-2 subsampling is a ``(.., Wo, 2*cout)[..., :cout]`` lane slice.
- cin must divide 128; the first block (cin=3) zero-pads input channels
  and kernel to 16 — identical math.

Eval-mode only (BN folded to scale/shift); the training path keeps the
native XLA ops. Numerics match the native path bit-for-bit up to bf16
matmul accumulation order (conv bf16 inputs, f32 accumulation, f32
BN/LeakyReLU, pool after bf16 cast — max commutes with the monotone cast).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pack_block_weights",
    "fold_bn_eval",
    "fused_conv_block",
    "fused_encoder_stage",
    "stage_supported",
]

_NEG = -3.0e38  # -inf stand-in that survives bf16/f32 casts


def _pad_cin(cin: int) -> int:
    """Smallest channel count >= cin that divides 128."""
    c = cin
    while 128 % c:
        c += 1
    return c


def stage_supported(
    H: int, W: int, cin: int,
    channels: Sequence[int], strides: Sequence[int],
) -> bool:
    """True if every block of the stage satisfies the kernel's layout
    constraints: stride in {1, 2} dividing H and W, W divisible by the
    phase count P = 128 // pad(cin), and (for stride 2) W*cout divisible
    by 256 (the even-w selection matmul operates on 256-lane groups)."""
    for ch, s in zip(channels, strides):
        P = 128 // _pad_cin(cin)
        if s not in (1, 2) or H % s or W % s or W % P:
            return False
        if s == 2 and (W * ch) % 256:
            return False
        H, W, cin = H // s, W // s, ch
    return True


def pack_block_weights(w: jnp.ndarray, P: Optional[int] = None) -> jnp.ndarray:
    """(3, 3, cin, cout) conv kernel -> (3, K, P*cout) phase-packed weights.

    P = 128 // cin' output w-phases per 128-lane input group (cin' = cin
    zero-padded to divide 128); K = (P + 2) * cin'.
    Wp[kh, r*cin' + ci, p*cout + co] = w[kh, r - p, ci, co] when
    0 <= r - p <= 2 (the kw tap), else 0.
    An explicit P overrides the default (the train-path dx kernel uses
    P = max(128//cin, 128//cout) so the output group width P*cout stays a
    lane multiple when cout < cin).
    """
    cin, cout = int(w.shape[2]), int(w.shape[3])
    cin_p = _pad_cin(cin)
    if cin_p != cin:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
        cin = cin_p
    if P is None:
        P = 128 // cin
    K = (P + 2) * cin
    r = np.arange(P + 2)[:, None]
    p = np.arange(P)[None, :]
    kw = r - p  # (P+2, P)
    mask = (kw >= 0) & (kw <= 2)
    kw_idx = np.clip(kw, 0, 2)
    # sel[kh, r, p, ci, co] = w[kh, kw_idx[r,p], ci, co] * mask
    sel = jnp.take(w, jnp.asarray(kw_idx.reshape(-1)), axis=1)
    sel = sel.reshape(3, P + 2, P, cin, cout)
    sel = sel * jnp.asarray(mask, w.dtype)[None, :, :, None, None]
    sel = jnp.transpose(sel, (0, 1, 3, 2, 4))  # (3, P+2, cin, P, cout)
    return sel.reshape(3, K, P * cout)


def fold_bn_eval(
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float,
    P: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold conv bias + eval-mode BN into per-lane (scale, shift), tiled P x.

    y = (conv + bias - mean) * gamma / sqrt(var + eps) + beta
      = conv * scale + shift.
    """
    inv = gamma * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = inv
    shift = (bias - mean) * inv + beta
    return (
        jnp.tile(scale.astype(jnp.float32), P)[None, :],
        jnp.tile(shift.astype(jnp.float32), P)[None, :],
    )


def _even_w_selector(cout: int) -> np.ndarray:
    """(256, 128) 0/1 matrix compacting even-w positions of a 256-lane
    merged (w, c) group into 128 lanes (used as an exact bf16 matmul —
    one source per output, so no rounding beyond the bf16 values)."""
    S = np.zeros((256, 128), np.float32)
    for lp in range(128):
        S[2 * (lp // cout) * cout + (lp % cout), lp] = 1.0
    return S


def _block_kernel(
    wp_ref, sc_ref, sh_ref, sel_ref, prev_ref, main_ref, next_ref, out_ref,
    *, H: int, W: int, cin: int, cout: int, stride: int, ht_out: int,
):
    """One grid program: (1, Ht_in, W*cin) rows -> (1, Ht_out, Wo*cout)."""
    P = 128 // cin
    G = W // P
    K = (P + 2) * cin
    N = P * cout
    ht_in = ht_out * stride
    n_conv = ht_in + 2          # conv rows computed per tile
    i = pl.program_id(1)
    row0 = i * ht_in            # global x row of main[0]
    Lx = W * cin

    # --- assemble ext rows (ht_in + 4, W*cin), zeroing out-of-image rows
    ext = jnp.concatenate(
        [prev_ref[0, ht_in - 2:ht_in, :], main_ref[0], next_ref[0, 0:2, :]],
        axis=0,
    )
    gx = row0 - 2 + jax.lax.broadcasted_iota(jnp.int32, (ht_in + 4, 1), 0)
    ext = jnp.where((gx >= 0) & (gx < H), ext, jnp.zeros_like(ext))

    # --- build phase windows X: (ht_in + 4, G, K)
    # (Mosaic rotates only 32-bit data, so the lane rolls run on f32)
    rows = ht_in + 4
    ext32 = ext.astype(jnp.float32)
    ext = ext.astype(jnp.bfloat16)
    mid = ext.reshape(rows, G, 128)
    left = pltpu.roll(ext32, cin, axis=1).reshape(rows, G, 128)[
        :, :, :cin].astype(jnp.bfloat16)
    right = pltpu.roll(ext32, Lx - 128, axis=1).reshape(rows, G, 128)[
        :, :, :cin].astype(jnp.bfloat16)
    X = jnp.concatenate([left, mid, right], axis=2)  # (rows, G, K)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    edge = ((gidx == 0) & (kidx < cin)) | ((gidx == G - 1) & (kidx >= K - cin))
    X = jnp.where(edge, jnp.zeros_like(X), X)
    Xf = X.reshape(rows * G, K)

    # --- conv: 3 accumulated matmuls (kh taps); conv row c uses ext row
    # c + kh, so tap kh streams Xf rows [kh*G, (kh + n_conv)*G)
    acc = jnp.zeros((n_conv * G, N), jnp.float32)
    for kh in range(3):
        acc = acc + jax.lax.dot_general(
            Xf[kh * G:(kh + n_conv) * G],
            wp_ref[kh],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # --- BN (eval scale/shift) + LeakyReLU(0.1), f32 as the native path
    y = acc * sc_ref[0] + sh_ref[0]
    y = jnp.where(y >= 0, y, 0.1 * y)

    # conv row c <-> global conv row row0 - 1 + c; invalidate rows outside
    # the image so the pool ignores them (MaxPool2d pad behaves as -inf)
    gc = (row0 - 1) + jax.lax.broadcasted_iota(
        jnp.int32, (n_conv * G, 1), 0) // G
    y = jnp.where((gc >= 0) & (gc < H), y, jnp.full_like(y, _NEG))

    # --- 3x3 max-pool on the merged (w, c) layout
    L = W * cout
    yr = y.reshape(n_conv, L)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    wl = jnp.where(lane >= cout, pltpu.roll(yr, cout, axis=1),
                   jnp.full_like(yr, _NEG))
    wr = jnp.where(lane < L - cout, pltpu.roll(yr, L - cout, axis=1),
                   jnp.full_like(yr, _NEG))
    wmax = jnp.maximum(yr, jnp.maximum(wl, wr))

    if stride == 1:
        out = jnp.maximum(
            wmax[0:ht_out],
            jnp.maximum(wmax[1:ht_out + 1], wmax[2:ht_out + 2]),
        )
    else:
        # rows: conv row c = 2*o' + {0, 1, 2}; pair rows then slice
        half = (n_conv + 1) // 2  # n_conv = 2*ht_out + 2 (even)
        paired = wmax.reshape(half, 2, L)
        ev, od = paired[:, 0, :], paired[:, 1, :]
        out = jnp.maximum(
            ev[0:ht_out], jnp.maximum(od[0:ht_out], ev[1:ht_out + 1]))
        # w: keep even positions — an exact selection matmul on 256-lane
        # groups (Mosaic only lane-splits at >=128 alignment, so a
        # (.., W/2, 2*cout)[..., :cout] reshape is not available)
        out = out.astype(jnp.bfloat16)
        m = out.reshape(ht_out, L // 256, 256).reshape(
            ht_out * (L // 256), 256)
        out = jax.lax.dot_general(
            m, sel_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(ht_out, L // 2)

    out_ref[0] = out.astype(jnp.bfloat16)


def fused_conv_block(
    x: jnp.ndarray,
    wp: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    *,
    H: int,
    W: int,
    cin: int,
    cout: int,
    stride: int,
    ht_out: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one fused encoder block.

    x: (B, H, W*cin) merged activations (bf16; f32 accepted and cast);
    cin must divide 128 (zero-pad channels first otherwise).
    wp: (3, K, P*cout) packed weights (pack_block_weights), bf16.
    scale/shift: (1, P*cout) folded eval BN + bias (fold_bn_eval), f32.
    Returns (B, Ho, Wo*cout) bf16 with Ho = H//stride, Wo = W//stride.
    """
    if 128 % cin:
        raise ValueError(f"cin={cin} must divide 128")
    B = x.shape[0]
    Ho = H // stride
    # Mosaic needs block second-minor dims divisible by 8 or equal to the
    # array dim; pick the largest ht_out <= requested satisfying that for
    # both the input tile (ht_in) and the output tile.
    ht_out = min(ht_out, Ho)
    while ht_out > 1:
        ht_in = ht_out * stride
        if (Ho % ht_out == 0
                and (ht_in % 8 == 0 or ht_in == H)
                and (ht_out % 8 == 0 or ht_out == Ho)):
            break
        ht_out -= 1
    else:
        ht_out = Ho
    ht_in = ht_out * stride
    ni = H // ht_in
    grid = (B, ni)

    def im_main(b, i):
        return (b, i, 0)

    def im_prev(b, i):
        return (b, jnp.maximum(i - 1, 0), 0)

    def im_next(b, i):
        return (b, jnp.minimum(i + 1, ni - 1), 0)

    in_block = (1, ht_in, W * cin)
    sel = jnp.asarray(_even_w_selector(cout), jnp.bfloat16)
    kern = functools.partial(
        _block_kernel, H=H, W=W, cin=cin, cout=cout, stride=stride,
        ht_out=ht_out,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(wp.shape, lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(scale.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(shift.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sel.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec(in_block, im_next, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ht_out, (W // stride) * cout), im_main,
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, Ho, (W // stride) * cout), jnp.bfloat16),
        interpret=interpret,
    )(wp, scale, shift, sel, x, x, x)


def fused_encoder_stage(
    x: jnp.ndarray,
    packed: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    *,
    H: int,
    W: int,
    cin: int,
    channels: Sequence[int],
    strides: Sequence[int],
    ht_out: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Chain fused blocks over one encoder stage.

    x: (B, H, W, cin); packed: per-block (wp, scale, shift).
    Returns (B, Ho, Wo, channels[-1]) bf16.
    """
    B = x.shape[0]
    cin_p = _pad_cin(cin)
    if cin_p != cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin)))
        cin = cin_p
    x = x.reshape(B, H, W * cin)
    for (wp, sc, sh), ch, s in zip(packed, channels, strides):
        x = fused_conv_block(
            x, wp, sc, sh, H=H, W=W, cin=cin, cout=ch, stride=s,
            ht_out=ht_out, interpret=interpret,
        )
        H, W, cin = H // s, W // s, ch
    return x.reshape(B, H, W, cin)
