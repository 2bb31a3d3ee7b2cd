"""Basic NN building blocks (flax.linen), channels-last.

Covers /root/reference/src/modules/basicConv.py: the reference's 1x1
Conv2d/Conv1d "FC" wrappers (with their permute churn) collapse to a single
Dense over the trailing channel axis — one fused MXU matmul regardless of
how many leading axes (B, N, K) there are. createCNNs (3x3 conv + BN +
LeakyReLU(0.1) + MaxPool) becomes an NHWC conv stack.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch BatchNorm defaults: eps 1e-5, running-stat update factor 0.1
# (flax momentum = 1 - torch momentum).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


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
            x = nn.max_pool(
                x, (3, 3), strides=(s, s), padding=((1, 1), (1, 1))
            )
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
