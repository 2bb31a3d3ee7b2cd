"""Basic NN building blocks (flax.linen), channels-last.

Covers /root/reference/src/modules/basicConv.py: the reference's 1x1
Conv2d/Conv1d "FC" wrappers (with their permute churn) collapse to a single
Dense over the trailing channel axis — one fused MXU matmul regardless of
how many leading axes (B, N, K) there are. createCNNs (3x3 conv + BN +
LeakyReLU(0.1) + MaxPool) becomes an NHWC conv stack.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i2pnet_tpu.ops import conv_pallas as _cpal
from i2pnet_tpu.ops import conv_pallas_train as _cpt

# torch BatchNorm defaults: eps 1e-5, running-stat update factor 0.1
# (flax momentum = 1 - torch momentum).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def _ambient_dp_axis(batch: Optional[int]) -> Optional[str]:
    """The ambient mesh's pure-data-parallel axis, if the fused Pallas paths
    can ride it via ``jax.shard_map``.

    Entry points that jit over a dp mesh wrap their calls in
    ``jax.set_mesh(mesh)`` (parallel/mesh.py) so the mesh is visible at
    trace time here. Requirements: a 'data' axis with size > 1, every other
    axis size 1 (spatially sharded W cannot go through a pallas_call), and
    the batch divisible by the axis size.
    """
    try:
        am = jax.sharding.get_abstract_mesh()
    except Exception:
        return None
    if am is None or not am.axis_names or "data" not in am.axis_names:
        return None
    if any(am.shape[n] > 1 for n in am.axis_names if n != "data"):
        return None
    size = am.shape["data"]
    if size <= 1 or batch is None or batch % size:
        return None
    return "data"


def _fused_mode(
    env_name: str, default: str, batch: Optional[int] = None
) -> Tuple[Optional[str], Optional[str]]:
    """Resolve a fused-path env flag (read at trace time).

    Values: "auto" — compiled Pallas wherever it is valid: single-device
    TPU processes, and multi-device processes whose jit runs under an
    ambient PURE-DP mesh (``jax.set_mesh``), where the kernels run
    per-shard inside a ``jax.shard_map`` with BN statistics psum'd.
    A multi-device process with NO ambient mesh stays native (a raw
    pallas_call has no GSPMD partitioning rule, so a jit+NamedSharding
    dp/sp mesh would have to replicate or reject it); "0" — always native;
    "1" — force Pallas on TPU (single-device-only unless an ambient dp
    mesh makes the shard_map wrap possible — under a sharded jit WITHOUT
    one, compilation will fail; use "auto"); "interpret" — force interpret
    mode (CPU parity tests; also rides the shard_map wrap under an
    ambient dp mesh).

    Returns (mode, dp_axis): mode None (native), "tpu", or "interpret";
    dp_axis the shard_map axis name or None for a direct pallas_call.
    """
    mode = os.environ.get(env_name, default)
    if mode == "0":
        return None, None
    if mode == "interpret":
        return "interpret", _ambient_dp_axis(batch)
    if jax.default_backend() == "tpu":
        dp = _ambient_dp_axis(batch)
        if mode == "auto" and jax.device_count() > 1 and dp is None:
            return None, None
        return "tpu", dp
    if mode == "1":
        return "interpret", _ambient_dp_axis(batch)
    return None, None


def _fused_eval_mode(batch: Optional[int] = None):
    return _fused_mode("I2PNET_FUSED_EVAL", "auto", batch)


def _fused_train_mode(batch: Optional[int] = None):
    # default "auto" since the round-3 TPU A/B: full free-point train step
    # 105.1 -> 91.5 ms (76.1 -> 87.5 pairs/s) at B=8 384x1280 bf16
    # (BASELINE.md round-3d; convergence guard re-run on the routed path)
    return _fused_mode("I2PNET_FUSED_TRAIN", "auto", batch)


class _RunningStats(nn.Module):
    """Holds/updates batch_stats/{mean,var} under this module's name.

    Named ``BatchNorm_j`` it writes the exact variable paths flax's
    nn.BatchNorm uses, so the fused train path keeps the native
    checkpoint/restore tree.
    """

    @nn.compact
    def __call__(self, mean: jnp.ndarray, var: jnp.ndarray) -> None:
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros_like(mean))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones_like(var))
        if not self.is_initializing():
            ra_mean.value = (
                BN_MOMENTUM * ra_mean.value + (1 - BN_MOMENTUM) * mean)
            ra_var.value = (
                BN_MOMENTUM * ra_var.value + (1 - BN_MOMENTUM) * var)


def _pool3_fwd(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, 3, 3, 1),
        (1, stride, stride, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _pool3_argtap(x, y, s):
    """Winning window-tap index per output cell, int32 in [0, 9] (9 = none;
    int8 would halve traffic but v5e Mosaic lacks 8-bit vector compares).

    first-match == MIN matching tap index: associative, so the whole
    computation is one parallel min-tree over the 9 shifted views of x —
    identical tie routing to XLA select-and-scatter's >= select.
    """
    B, H, W, C = x.shape
    Ho, Wo = y.shape[1:3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    argtap = jnp.full(y.shape, 9, jnp.int32)
    for o in range(9):
        oh, ow = o // 3, o % 3
        tap = lax.slice(
            xp,
            (0, oh, ow, 0),
            (B, oh + (Ho - 1) * s + 1, ow + (Wo - 1) * s + 1, C),
            (1, s, s, 1),
        )
        argtap = jnp.minimum(
            argtap, jnp.where(tap == y, jnp.int32(o), jnp.int32(9))
        )
    return argtap


def _pool3_route_kernel(s, Tq, Wo, nb):
    """Pallas kernel: route output cotangents to winning input taps.

    Tiles are channels-major (Cb, Tq, Wo) with the W axis in lanes; the
    row halo (one output row each side) arrives as the prev/next row
    blocks of the same arrays, masked at the global boundaries.
    """

    def kernel(at_prev, at_main, at_next, ct_prev, ct_main, ct_next, dx_ref):
        i = pl.program_id(2)
        atE = jnp.concatenate(
            [at_prev[0, :, -1:], at_main[0], at_next[0, :, :1]], axis=1
        )  # (Cb, Tq+2, Wo)
        ctE = jnp.concatenate(
            [ct_prev[0, :, -1:], ct_main[0], ct_next[0, :, :1]], axis=1
        )
        rowid = jax.lax.broadcasted_iota(jnp.int32, atE.shape, 1)
        bad = ((i == 0) & (rowid == 0)) | ((i == nb - 1) & (rowid == Tq + 1))
        atE = jnp.where(bad, jnp.int32(9), atE)
        atE = jnp.pad(atE, ((0, 0), (0, 0), (1, 1)), constant_values=9)
        ctE = jnp.pad(ctE, ((0, 0), (0, 0), (1, 1)))

        if s == 1:
            acc = None
            for o in range(9):
                oh, ow = o // 3, o % 3
                contrib = jnp.where(atE == o, ctE, 0)
                sl = contrib[:, 2 - oh : 2 - oh + Tq, 2 - ow : 2 - ow + Wo]
                acc = sl if acc is None else acc + sl
            dx_ref[0] = acc
        else:  # s == 2: write input-parity planes; Mosaic cannot lane-
            # interleave, so the wrapper transposes (ph, pw) planes back
            # to (H, W) in XLA (one cheap transpose pass)
            for ph in (0, 1):
                for pw in (0, 1):
                    acc = None
                    for oh in range(3):
                        for ow in range(3):
                            if (oh + 1) % 2 != ph or (ow + 1) % 2 != pw:
                                continue
                            o = oh * 3 + ow
                            j0 = (ph + 3 - oh) // 2
                            k0 = (pw + 3 - ow) // 2
                            contrib = jnp.where(atE == o, ctE, 0)
                            sl = contrib[:, j0 : j0 + Tq, k0 : k0 + Wo]
                            acc = sl if acc is None else acc + sl
                    dx_ref[0, :, ph, pw] = acc

    return kernel


def _pool3_safe_tile(Ho: int, Wo: int, C: int):
    """Largest row-tile Tq with the kernel's VMEM footprint in budget.

    Per output element the kernel holds ~3x(i32+bf16) inputs + s^2 outputs,
    double-buffered => ~52 B; cap tiles at ~8 MB of the 16 MB scoped limit
    (stage-2 shapes OOM'd at Tq=32). None = no safe tile, use native.
    """
    return next(
        (t for t in (32, 16, 8, 4, 2, 1) if Ho % t == 0 and C * t * Wo <= 160_000),
        None,
    )


def _pool3_route_pallas(argtap, ct, s):
    """dx (B, H, W, C) from argtap/ct (B, Ho, Wo, C); s in {1, 2} with
    H == s * Ho, W == s * Wo."""
    B, Ho, Wo, C = ct.shape
    Tq = _pool3_safe_tile(Ho, Wo, C)
    nb = Ho // Tq
    at = jnp.transpose(argtap, (0, 3, 1, 2))  # (B, C, Ho, Wo)
    c = jnp.transpose(ct, (0, 3, 1, 2))

    def idx(shift):
        return lambda b, cb, i: (b, cb, jnp.clip(i + shift, 0, nb - 1), 0)

    spec_at = [
        pl.BlockSpec((1, C, Tq, Wo), idx(sh), memory_space=pltpu.VMEM)
        for sh in (-1, 0, 1)
    ]
    spec_ct = [
        pl.BlockSpec((1, C, Tq, Wo), idx(sh), memory_space=pltpu.VMEM)
        for sh in (-1, 0, 1)
    ]
    interp = jax.default_backend() == "cpu"
    if s == 1:
        out_spec = pl.BlockSpec(
            (1, C, Tq, Wo),
            lambda b, cb, i: (b, cb, i, 0),
            memory_space=pltpu.VMEM,
        )
        dx = pl.pallas_call(
            _pool3_route_kernel(s, Tq, Wo, nb),
            grid=(B, 1, nb),
            in_specs=spec_at + spec_ct,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, Ho, Wo), ct.dtype),
            interpret=interp,
        )(at, at, at, c, c, c)
        return jnp.transpose(dx, (0, 2, 3, 1))
    # s == 2: parity-major planes, interleaved back by one XLA transpose
    out_spec = pl.BlockSpec(
        (1, C, 2, 2, Tq, Wo),
        lambda b, cb, i: (b, cb, 0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    de = pl.pallas_call(
        _pool3_route_kernel(s, Tq, Wo, nb),
        grid=(B, 1, nb),
        in_specs=spec_at + spec_ct,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, 2, 2, Ho, Wo), ct.dtype),
        interpret=interp,
    )(at, at, at, c, c, c)
    # dx[b, 2m+ph, 2n+pw, c] = de[b, c, ph, pw, m, n]
    return jnp.transpose(de, (0, 4, 2, 5, 3, 1)).reshape(
        B, 2 * Ho, 2 * Wo, C
    )


def _pool3_allties_bwd(x, y, ct, s):
    """dx for the 3x3/stride-s max-pool, distributing the cotangent to ALL
    window entries equal to the max (a valid subgradient; XLA's
    select-and-scatter routes ties to the first match instead). Pure
    elementwise shifts — no select-and-scatter, no argtap pass — so the
    whole backward fuses into one pass over the full-res arrays.

    s == 1: dx[i] = sum over the 9 windows covering i of ct * [x == y].
    s == 2: by input parity plane (ph, pw): even coordinates are covered by
    exactly one window, odd by two per axis — 1/2/4 taps on the quarter-res
    y/ct grids, re-interleaved by one transpose.
    """
    if s == 1:
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=-jnp.inf)
        cp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
        H, W = x.shape[1:3]
        dx = None
        for oh in range(3):
            for ow in range(3):
                ys = lax.slice(yp, (0, oh, ow, 0),
                               (yp.shape[0], oh + H, ow + W, yp.shape[3]))
                cs = lax.slice(cp, (0, oh, ow, 0),
                               (cp.shape[0], oh + H, ow + W, cp.shape[3]))
                contrib = jnp.where(x == ys, cs, jnp.zeros_like(cs))
                dx = contrib if dx is None else dx + contrib
        return dx
    # s == 2: H == 2*Ho, W == 2*Wo (guarded by the caller)
    B, Ho, Wo, C = y.shape
    yp = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)),
                 constant_values=-jnp.inf)
    cp = jnp.pad(ct, ((0, 0), (0, 1), (0, 1), (0, 0)))
    planes = []
    for ph in (0, 1):
        row = []
        for pw in (0, 1):
            xp = x[:, ph::2, pw::2, :]  # (B, Ho, Wo, C)
            # input row 2m+ph is covered by output windows m (+ m+1 if odd)
            taps_h = (0,) if ph == 0 else (0, 1)
            taps_w = (0,) if pw == 0 else (0, 1)
            acc = None
            for a in taps_h:
                for b in taps_w:
                    ys = lax.slice(yp, (0, a, b, 0), (B, a + Ho, b + Wo, C))
                    cs = lax.slice(cp, (0, a, b, 0), (B, a + Ho, b + Wo, C))
                    contrib = jnp.where(xp == ys, cs, jnp.zeros_like(cs))
                    acc = contrib if acc is None else acc + contrib
            row.append(acc)
        planes.append(row)
    # interleave: dx[b, 2m+ph, 2n+pw, c] = planes[ph][pw][b, m, n, c]
    stacked = jnp.stack(
        [jnp.stack(row, axis=0) for row in planes], axis=0
    )  # (2, 2, B, Ho, Wo, C)
    return jnp.transpose(stacked, (2, 3, 0, 4, 1, 5)).reshape(
        B, 2 * Ho, 2 * Wo, C
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pool3_allties(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return _pool3_fwd(x, stride)


def _pool3_allties_vjp_fwd(x, stride):
    y = _pool3_fwd(x, stride)
    return y, (x, y)


def _pool3_allties_vjp_bwd(stride, res, ct):
    x, y = res
    return (_pool3_allties_bwd(x, y, ct, stride),)


_pool3_allties.defvjp(_pool3_allties_vjp_fwd, _pool3_allties_vjp_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pool3_custom(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return _pool3_fwd(x, stride)


def _pool3_vjp_fwd(x, stride):
    y = _pool3_fwd(x, stride)
    return y, (x, y)


def _pool3_vjp_bwd(stride, res, ct):
    x, y = res
    if _pool3_safe_tile(y.shape[1], y.shape[2], y.shape[3]) is None:
        # no VMEM-safe tiling -> native select-and-scatter
        _, pull = jax.vjp(lambda v: _pool3_fwd(v, stride), x)
        return pull(ct)
    argtap = _pool3_argtap(x, y, stride)
    return (_pool3_route_pallas(argtap, ct, stride),)


_pool3_custom.defvjp(_pool3_vjp_fwd, _pool3_vjp_bwd)


def _pool3_s1_spmd_bwd(x, y, ct):
    """dx for the stride-1 3x3 pool with FIRST-WINS tie routing as pure
    shifts: argtap min-tree (identical tie order to select-and-scatter's
    >= select) + a 9-tap routed sum. Every op is an elementwise/static-
    slice op, so GSPMD partitions it exactly under spatial sharding.

    Why this exists: XLA's partitioned select-and-scatter SILENTLY DROPS
    gradient contributions when the pool windows overlap (stride < window)
    along a sharded axis — measured on XLA:CPU (jax 0.9.0): sharding W of
    a (4,8,16,4) input across 2 devices zeroes most of shard 0's dx for
    stride 1 while stride 2 is exact (tests/test_spatial_parallel.py
    documents the repro). The shipped encoder's last stage pools at
    stride 1, so spatial parallelism needs this routing.
    """
    argtap = _pool3_argtap(x, y, 1)
    B, H, W, C = x.shape
    atp = jnp.pad(argtap, ((0, 0), (1, 1), (1, 1), (0, 0)),
                  constant_values=9)
    ctp = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dx = None
    for o in range(9):
        oh, ow = o // 3, o % 3
        # input (i, j) is tap (oh, ow) of output window (i+1-oh, j+1-ow);
        # +1 padding on the output arrays makes that slice offset
        # (2-oh, 2-ow) (same geometry as _pool3_route_kernel's s==1 path)
        ats = lax.slice(
            atp, (0, 2 - oh, 2 - ow, 0), (B, 2 - oh + H, 2 - ow + W, C)
        )
        cs = lax.slice(
            ctp, (0, 2 - oh, 2 - ow, 0), (B, 2 - oh + H, 2 - ow + W, C)
        )
        contrib = jnp.where(ats == o, cs, jnp.zeros_like(cs))
        dx = contrib if dx is None else dx + contrib
    return dx


@jax.custom_vjp
def _pool3_s1_spmd(x: jnp.ndarray) -> jnp.ndarray:
    return _pool3_fwd(x, 1)


def _pool3_s1_spmd_vjp_fwd(x):
    y = _pool3_fwd(x, 1)
    return y, (x, y)


def _pool3_s1_spmd_vjp_bwd(res, ct):
    x, y = res
    return (_pool3_s1_spmd_bwd(x, y, ct),)


_pool3_s1_spmd.defvjp(_pool3_s1_spmd_vjp_fwd, _pool3_s1_spmd_vjp_bwd)


def max_pool_3x3(
    x: jnp.ndarray, stride: int, spmd_safe: bool = False
) -> jnp.ndarray:
    """3x3 max-pool, stride s, pad 1 (the reference's MaxPool2d(3, s, 1),
    ref basicConv.py:17).

    Backward-formulation measurements at the encoder's stage-1 shapes
    (tools/bench_rgb_stage.py, B=8, 384x1280, bf16 pools):
      native select-and-scatter   41.4 ms backward   <- default
      9-way interior-pad routing 427   ms (pads do not fuse)
      transposed-conv routing     68.5 ms
      Pallas parity-plane kernel  74.3 ms (NCHW transposes + i32 argtap
                                  glue cost more than the op it replaces)
      no pools at all             12.7 ms (lower bound)
    XLA's select-and-scatter is ~3x traffic-roofline — hard to beat from
    outside a fused kernel. The custom VJP (argtap + Pallas routing) is
    kept behind I2PNET_POOL_PALLAS=1 (read at trace time) for future
    hardware/toolchain revisions; the measured-fastest native op is the
    default. The real win retained here is pooling in the compute dtype
    (bf16 halves pool traffic: 56 -> 41.4 ms).
    """
    B, H, W, C = x.shape
    Ho = (H - 1) // stride + 1
    Wo = (W - 1) // stride + 1
    clean = stride in (1, 2) and H == stride * Ho and W == stride * Wo
    if clean and os.environ.get("I2PNET_POOL_ALLTIES") == "1":
        # all-ties subgradient backward: pure shifts, fully fusable
        # (round-3 A/B candidate; see _pool3_allties_bwd)
        return _pool3_allties(x, stride)
    if clean and os.environ.get("I2PNET_POOL_PALLAS") == "1":
        return _pool3_custom(x, stride)
    if stride == 1 and (
        spmd_safe or os.environ.get("I2PNET_POOL_SPMD_S1") == "1"
    ):
        # GSPMD-safe backward for OVERLAPPING windows: partitioned
        # select-and-scatter drops cross-shard contributions at stride 1
        # (see _pool3_s1_spmd_bwd). Bit-identical routing single-device
        # (first-wins ties). Gated on cfg.spatial_parallel rather than
        # default because the shipped encoder pools at stride 1 in EVERY
        # stage — the native op is the measured-fastest single-chip
        # backward (table above) and the reroute is unmeasured on TPU;
        # I2PNET_POOL_SPMD_S1=1 force-enables it for that A/B.
        return _pool3_s1_spmd(x)
    return _pool3_fwd(x, stride)


def batch_norm(train: bool, name: Optional[str] = None) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        name=name,
    )


class BatchStatsNorm(nn.Module):
    """BatchNorm with track_running_stats=False: normalize by the CURRENT
    batch statistics in both train and eval, learned scale/bias, no state.

    The projection path uses this everywhere (ref PPBackbone_center.py:30
    `BatchNorm2d(track_running_stats=not use_bn_input)` with
    use_bn_input=True, config_proj_lidarcenter.py:8).

    dtype: apply the normalization in this dtype (statistics are always
    computed in f32) — the PointwiseConv bn-in-compute-dtype path.
    """

    epsilon: float = BN_EPS
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        if self.dtype is not None:
            rs = (jax.lax.rsqrt(var + self.epsilon)).astype(self.dtype)
            y = (x.astype(self.dtype) - mean.astype(self.dtype)) * rs
            return y * scale.astype(self.dtype) + bias.astype(self.dtype)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class PointwiseConv(nn.Module):
    """Dense (+BN +activation) over the channel axis.

    Equivalent to ref basicConv.py:23-60 Conv2d([1,1]) and :63-85 Conv1d(k=1)
    without the layout permutes. activation: 'leaky' (LeakyReLU 0.1, the
    reference default), 'relu', or None.
    """

    features: int
    use_bn: bool = False
    activation: Optional[str] = "leaky"
    bn_stats: bool = True  # False -> BatchStatsNorm (track_running_stats off)
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        if self.use_bn:
            # statistics always f32; with a compute dtype set, the
            # NORMALIZATION is applied in it (the encoder's round-3
            # bn_compute_dtype recipe) — halves the BN/activation chain's
            # HBM traffic and residuals on the big (B,N,K,C) tensors
            # (round-5b: cv1 grad 19 GB accessed was ~2x its bf16 budget;
            # I2PNET_PW_BN_F32=1 restores the all-f32 application for A/B)
            bn_dt = self.dtype
            if bn_dt is None or os.environ.get("I2PNET_PW_BN_F32") == "1":
                bn_dt = None
            if self.bn_stats:
                if bn_dt is not None:
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=BN_MOMENTUM,
                        epsilon=BN_EPS, dtype=bn_dt,
                    )(x)
                else:
                    x = batch_norm(train)(x.astype(jnp.float32))
            else:
                x = BatchStatsNorm(dtype=bn_dt)(
                    x if bn_dt is not None else x.astype(jnp.float32))
        if self.activation == "leaky":
            x = nn.leaky_relu(x, negative_slope=0.1)
        elif self.activation == "relu":
            x = nn.relu(x)
        return x


class PointwiseMLP(nn.Module):
    """Stack of PointwiseConv layers (a reference mlp_convs ModuleList)."""

    features: Sequence[int]
    use_bn: bool = True
    activation: Optional[str] = "leaky"
    bn_stats: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for f in self.features:
            x = PointwiseConv(
                f,
                use_bn=self.use_bn,
                activation=self.activation,
                bn_stats=self.bn_stats,
                dtype=self.dtype,
            )(x, train)
        return x


class RGBEncoderStage(nn.Module):
    """One createCNNs stage (ref basicConv.py:6-20).

    Per block: 3x3 conv (stride 1, pad 1) -> BN -> LeakyReLU(0.1) ->
    3x3 max-pool (stride s, pad 1). NHWC.

    bn_compute_dtype: apply BN normalization in the compute dtype instead
    of f32 (statistics and running stats stay f32 — flax promotes the
    reductions); halves the BN/LeakyReLU chain's HBM residual traffic in
    bf16 training.
    """

    channels: Sequence[int]
    strides: Sequence[int]
    dtype: Optional[jnp.dtype] = None
    bn_compute_dtype: bool = False
    spmd_pool: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if (
            not train
            and not self.is_initializing()
            and self.dtype == jnp.bfloat16
            and not self.spmd_pool  # Pallas has no GSPMD partition rule
        ):
            # eval fast path: BN folded to scale/shift, one fused Pallas
            # kernel per block (ops/conv_pallas.py) — removes the 128-lane
            # channel-padding HBM traffic of the small-channel convs
            # (measured 12.66 -> 5.42 ms / 7.86 -> 0.55 GB for the full
            # encoder at B8 384x1280). Under an ambient pure-DP mesh the
            # blocks run per-shard inside a shard_map over the data axis.
            B, H, W, cin = x.shape
            mode, dp_axis = _fused_eval_mode(B)
            if mode is not None and _cpal.stage_supported(
                H, W, cin, self.channels, self.strides
            ):
                return self._fused_eval(
                    x, interpret=(mode == "interpret"), dp_axis=dp_axis
                )
        if (
            train
            and not self.is_initializing()
            and self.dtype == jnp.bfloat16
            and not self.spmd_pool  # Pallas has no GSPMD partition rule
        ):
            # train fast path: fused merged-layout Pallas blocks with batch
            # statistics and a custom VJP (ops/conv_pallas_train.py) —
            # removes the 128-lane channel-padding HBM traffic in BOTH
            # directions. Default since the round-3d A/B (91.5 vs 105.1 ms
            # free train step; BASELINE.md round-3d); I2PNET_FUSED_TRAIN
            # overrides. Under an ambient pure-DP mesh the stage runs
            # per-shard in a shard_map with BN batch moments psum'd, so
            # gradients match the global-batch native step.
            B, H, W, cin = x.shape
            mode, dp_axis = _fused_train_mode(B)
            if mode is not None and _cpt.stage_supported_train(
                H, W, cin, self.channels, self.strides
            ):
                return self._fused_train(
                    x, interpret=(mode == "interpret"), dp_axis=dp_axis
                )
        bn_dt = self.dtype if (self.bn_compute_dtype and self.dtype is not None) else None
        for ch, s in zip(self.channels, self.strides):
            x = nn.Conv(
                ch, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                dtype=self.dtype,
            )(x)
            # remat boundary tag: under the encoder's checkpoint policy only
            # these conv outputs are saved for the backward; the BN/LeakyReLU
            # /pool chain is recomputed instead of round-tripping HBM.
            # A no-op without remat.
            x = jax.ad_checkpoint.checkpoint_name(x, "conv_out")
            if bn_dt is None:
                # normalization applied in f32 (round-2 default)
                x = x.astype(jnp.float32)
                x = batch_norm(train)(x)
            else:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=BN_MOMENTUM,
                    epsilon=BN_EPS,
                    dtype=bn_dt,
                )(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
            if self.dtype is not None:
                # max commutes with the monotone bf16 cast: pooling after
                # the cast is bit-identical to casting the pooled result,
                # and halves the pool's HBM traffic (the next conv casts
                # to compute dtype anyway)
                x = x.astype(self.dtype)
            # native select-and-scatter backward by default; the Pallas
            # routing sits behind I2PNET_POOL_PALLAS (see max_pool_3x3's
            # docstring for the measurements)
            x = max_pool_3x3(x, s, spmd_safe=self.spmd_pool)
        return x

    def _fused_eval(
        self,
        x: jnp.ndarray,
        *,
        interpret: bool,
        dp_axis: Optional[str] = None,
    ) -> jnp.ndarray:
        """Apply the stage via the fused Pallas blocks (eval-mode only).

        Reads the Conv_j/BatchNorm_j params + running stats directly from
        this module's bound variables (the native path's tree, unchanged)
        and folds each block's bias + eval BN into a per-lane scale/shift.
        Numerics match the native bf16 path up to bf16 matmul accumulation
        order (BN applied in f32; the native bn_compute_dtype=True path
        applies it in bf16 — same rounding magnitude).

        dp_axis: run per-shard under ``jax.shard_map`` over that ambient
        mesh axis (weights replicated, batch sharded) — eval blocks are
        per-example, so no collective is needed.
        """
        v = self.variables
        params, stats = v["params"], v["batch_stats"]
        _, H, W, cin = x.shape
        packed = []
        for j in range(len(self.channels)):
            w = params[f"Conv_{j}"]["kernel"]
            P = 128 // _cpal._pad_cin(int(w.shape[2]))
            sc, sh = _cpal.fold_bn_eval(
                params[f"Conv_{j}"]["bias"],
                stats[f"BatchNorm_{j}"]["mean"],
                stats[f"BatchNorm_{j}"]["var"],
                params[f"BatchNorm_{j}"]["scale"],
                params[f"BatchNorm_{j}"]["bias"],
                BN_EPS,
                P,
            )
            packed.append(
                (_cpal.pack_block_weights(w).astype(jnp.bfloat16), sc, sh)
            )
        run = partial(
            _cpal.fused_encoder_stage,
            H=H,
            W=W,
            cin=cin,
            channels=self.channels,
            strides=self.strides,
            interpret=interpret,
        )
        xb = x.astype(jnp.bfloat16)
        if dp_axis is not None:
            from jax.sharding import PartitionSpec as _P

            # check_vma off: pallas_call carries no varying-mesh-axes info
            # for the checker; correctness is pinned by tests/test_dp_fused.py
            return jax.shard_map(
                run,
                in_specs=(_P(dp_axis), _P()),
                out_specs=_P(dp_axis),
                check_vma=False,
            )(xb, packed)
        return run(xb, packed)

    def _fused_train(
        self,
        x: jnp.ndarray,
        *,
        interpret: bool,
        dp_axis: Optional[str] = None,
    ) -> jnp.ndarray:
        """Apply the stage via the fused train-mode Pallas path.

        Reads Conv_j/BatchNorm_j params from the bound variables (grads
        flow to the same leaves), runs ops/conv_pallas_train.py
        fused_stage_train (conv custom-VJP + batch-stat BN + bn_pool),
        and updates batch_stats/BatchNorm_j/{mean,var} with the flax
        momentum rule via _RunningStats submodules (same tree paths as
        the native nn.BatchNorm).

        dp_axis: run per-shard under ``jax.shard_map`` over that ambient
        pure-DP mesh axis. The BN batch moments are psum'd across the axis
        inside fused_stage_train, so the normalization, the returned
        stats, and the gradients all match the global-batch computation
        GSPMD produces for the native path (shard_map's transpose psums
        the replicated weights' cotangents).
        """
        params = self.variables["params"]
        _, H, W, cin = x.shape
        blocks = [
            (
                params[f"Conv_{j}"]["kernel"],
                params[f"Conv_{j}"]["bias"],
                params[f"BatchNorm_{j}"]["scale"],
                params[f"BatchNorm_{j}"]["bias"],
            )
            for j in range(len(self.channels))
        ]
        run = partial(
            _cpt.fused_stage_train,
            H=H,
            W=W,
            cin=cin,
            channels=self.channels,
            strides=self.strides,
            eps=BN_EPS,
            interpret=interpret,
            axis_name=dp_axis,
        )
        if dp_axis is not None:
            from jax.sharding import PartitionSpec as _P

            # check_vma off (pallas_call has no vma info); the stats are
            # psum'd inside so the P() out_spec is genuinely replicated
            out, stats = jax.shard_map(
                run,
                in_specs=(_P(dp_axis), _P()),
                out_specs=(_P(dp_axis), _P()),
                check_vma=False,
            )(x, blocks)
        else:
            out, stats = run(x, blocks)
        for j, (mean, var) in enumerate(stats):
            _RunningStats(name=f"BatchNorm_{j}")(mean, var)
        return out


class RGBEncoder(nn.Module):
    """Three-stage RGB pyramid (ref modellearn.py:56-64 / :190-194).

    Returns the stage outputs (RF1, RF2, RF3); overall stride is the product
    of all pool strides (x32 for the shipped config).

    remat: checkpoint each stage, saving ONLY the tagged conv outputs;
    the backward recomputes the BN/LeakyReLU/pool chains from them instead
    of storing every intermediate at full resolution. The step is
    HBM-bound at ~3 ms of v5e compute (BASELINE.md round-2 investigation),
    so trading recompute FLOPs for residual traffic is the right direction.
    Param/collection tree paths are unchanged (stages keep their auto
    names via explicit name=).
    """

    stages: Tuple[Tuple[int, Tuple[int, ...], Tuple[int, ...]], ...]
    dtype: Optional[jnp.dtype] = None
    bn_compute_dtype: bool = False
    remat: bool = False
    spmd_pool: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.remat:
            Stage = nn.remat(
                RGBEncoderStage,
                static_argnums=(2,),  # train flag
                policy=jax.checkpoint_policies.save_only_these_names("conv_out"),
            )
        else:
            Stage = RGBEncoderStage
        outs = []
        for i, (_, channels, strides) in enumerate(self.stages):
            x = Stage(
                channels,
                strides,
                dtype=self.dtype,
                bn_compute_dtype=self.bn_compute_dtype,
                spmd_pool=self.spmd_pool,
                name=f"RGBEncoderStage_{i}",
            )(x, train)
            outs.append(x)
        return tuple(outs)
