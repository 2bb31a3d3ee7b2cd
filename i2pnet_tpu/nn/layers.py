"""Basic NN building blocks (flax.linen), channels-last.

Covers /root/reference/src/modules/basicConv.py: the reference's 1x1
Conv2d/Conv1d "FC" wrappers (with their permute churn) collapse to a single
Dense over the trailing channel axis — one fused MXU matmul regardless of
how many leading axes (B, N, K) there are. createCNNs (3x3 conv + BN +
LeakyReLU(0.1) + MaxPool) becomes an NHWC conv stack.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# torch BatchNorm defaults: eps 1e-5, running-stat update factor 0.1
# (flax momentum = 1 - torch momentum).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def _pool3_fwd(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, 3, 3, 1),
        (1, stride, stride, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_3x3(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """3x3 max-pool, stride s, pad 1 (the reference's MaxPool2d(3, s, 1),
    ref basicConv.py:17) with a scatter-free backward.

    The native autodiff backward is XLA select-and-scatter, which owns
    most of the RGB encoder's backward at 384x1280 (stage-1 ablation:
    57 ms backward with pools vs 13 ms without, tools/bench_rgb_stage.py).
    This VJP routes each output's cotangent to the FIRST max in window
    scan order — identical semantics to select-and-scatter's >= select —
    via an argtap min-tree plus ONE transposed convolution on the MXU.
    (A 9-way interior-pad add tree was tried first and measured 4x WORSE
    than select-and-scatter — pads don't fuse; the conv formulation is
    the one that works.)
    """
    return _pool3_fwd(x, stride)


def _pool3_vjp_fwd(x, stride):
    y = _pool3_fwd(x, stride)
    return y, (x, y)


def _pool3_vjp_bwd(stride, res, ct):
    x, y = res
    B, H, W, C = x.shape
    Ho, Wo = y.shape[1:3]
    s = stride
    # pad with -inf: out-of-image window taps can never match the max
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    zero = jnp.zeros((), ct.dtype)

    def tap_slice(oh, ow):
        return lax.slice(
            xp,
            (0, oh, ow, 0),
            (B, oh + (Ho - 1) * s + 1, ow + (Wo - 1) * s + 1, C),
            (1, s, s, 1),
        )

    # first-match == MIN matching tap index: associative, so the whole
    # argtap computation is one parallel min-tree (a single fused pass
    # over the 9 shifted views) — no loop-carried dependency.
    argtap = jnp.full(y.shape, 9, jnp.int8)
    for o in range(9):
        eq = tap_slice(o // 3, o % 3) == y
        argtap = jnp.minimum(argtap, jnp.where(eq, jnp.int8(o), jnp.int8(9)))

    # Route each output's cotangent to its winning tap position with ONE
    # transposed convolution on the MXU: contrib stacks the 9 routed
    # planes channel-wise, and a fixed 0/1 kernel with lhs_dilation=s
    # performs every shift/dilation in a single well-optimized conv op
    # (the earlier 9-way interior-pad add tree did not fuse: 427 ms).
    tap = jax.lax.broadcasted_iota(jnp.int8, (9, 1), 0).reshape(1, 1, 1, 9, 1)
    contrib = jnp.where(
        argtap[:, :, :, None, :] == tap, ct[:, :, :, None, :], zero
    ).reshape(B, Ho, Wo, 9 * C)

    # K[kh, kw, (oh*3+ow)*C + c, c] = 1 with o = 2 - k (correlation index
    # reversal); padding low 1, high H - (Ho-1)*s - 1 + 1 maps dilated
    # output positions s*q - 1 + o onto the input grid exactly.
    k = np.zeros((3, 3, 9 * C, C), np.float32)
    for oh in range(3):
        for ow in range(3):
            o = oh * 3 + ow
            for c in range(C):
                k[2 - oh, 2 - ow, o * C + c, c] = 1.0
    kernel = jnp.asarray(k, ct.dtype)

    pad_h = (1, H - (Ho - 1) * s - 1 + 1)
    pad_w = (1, W - (Wo - 1) * s - 1 + 1)
    dx = lax.conv_general_dilated(
        contrib,
        kernel,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(s, s),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=ct.dtype,
    )
    return (dx,)


max_pool_3x3.defvjp(_pool3_vjp_fwd, _pool3_vjp_bwd)


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
    """

    epsilon: float = BN_EPS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
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
            # normalization statistics always in f32
            x = x.astype(jnp.float32)
            x = batch_norm(train)(x) if self.bn_stats else BatchStatsNorm()(x)
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
    """

    channels: Sequence[int]
    strides: Sequence[int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for ch, s in zip(self.channels, self.strides):
            x = nn.Conv(
                ch, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                dtype=self.dtype,
            )(x)
            x = x.astype(jnp.float32)
            x = batch_norm(train)(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
            if self.dtype is not None:
                # max commutes with the monotone bf16 cast: pooling after
                # the cast is bit-identical to casting the pooled result,
                # and halves the pool's HBM traffic (the next conv casts
                # to compute dtype anyway)
                x = x.astype(self.dtype)
            # max_pool_3x3's transposed-conv backward beats XLA's
            # select-and-scatter (measurements in tools/bench_rgb_stage.py)
            x = max_pool_3x3(x, s)
        return x


class RGBEncoder(nn.Module):
    """Three-stage RGB pyramid (ref modellearn.py:56-64 / :190-194).

    Returns the stage outputs (RF1, RF2, RF3); overall stride is the product
    of all pool strides (x32 for the shipped config).
    """

    stages: Tuple[Tuple[int, Tuple[int, ...], Tuple[int, ...]], ...]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        outs = []
        for _, channels, strides in self.stages:
            x = RGBEncoderStage(channels, strides, dtype=self.dtype)(x, train)
            outs.append(x)
        return tuple(outs)
