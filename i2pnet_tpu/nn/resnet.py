"""ResNet image encoder (ref /root/reference/src/resnet.py + ImageEncoder
:351-359 — shipped as an optional alternative to createCNNs, unused by the
default models).

Standard BasicBlock ResNet in flax, NHWC, returning the stage pyramid; the
ImageEncoder picks three levels (stride 8/16/32), matching the reference's
`resnet_out[3], resnet_out[4], resnet_out[5]`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from i2pnet_tpu.nn.layers import batch_norm


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(x)
        y = batch_norm(train)(y.astype(jnp.float32))
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype)(y)
        y = batch_norm(train)(y.astype(jnp.float32))
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = batch_norm(train, name="downsample_bn")(
                residual.astype(jnp.float32)
            )
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """ResNet-{18, 34}-style pyramid encoder.

    Returns (C3, C4, C5) feature maps at stride 8/16/32 — the three levels
    the reference ImageEncoder exposes.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet34
    widths: Sequence[int] = (64, 128, 256, 512)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = batch_norm(train, name="stem_bn")(x.astype(jnp.float32))
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        for si, (blocks, width) in enumerate(zip(self.stage_sizes, self.widths)):
            for bi in range(blocks):
                strides = 2 if (si > 0 and bi == 0) else 1
                x = BasicBlock(width, strides, dtype=self.dtype,
                               name=f"stage{si}_block{bi}")(x, train)
            outs.append(x)
        # strides of outs: 4, 8, 16, 32 -> return 8/16/32
        return outs[1], outs[2], outs[3]
