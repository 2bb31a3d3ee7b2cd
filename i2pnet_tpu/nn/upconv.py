"""KNN feature upsampling (ref /root/reference/src/modules/pointnet2_module.py:7-82).

SetUpconv propagates coarse-level (xyz2) features to the finer level (xyz1):
group feat2 around each xyz1 query, MLP + max-pool, concat feat1, MLP2.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from i2pnet_tpu.nn.layers import PointwiseMLP
from i2pnet_tpu.ops.pointops import grouping


class SetUpconv(nn.Module):
    nsample: int
    mlp: Sequence[int]
    mlp2: Sequence[int]
    dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(
        self,
        xyz1: jnp.ndarray,
        xyz2: jnp.ndarray,
        feat1: Optional[jnp.ndarray],
        feat2: jnp.ndarray,
        raw_xyz1: Optional[jnp.ndarray] = None,
        raw_xyz2: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """xyz1 (B,N1,3) fine; xyz2 (B,N2,3) coarse; feat1 (B,N1,C1);
        feat2 (B,N2,C2). Optional raw coordinates carry the second frame for
        geometric diffs (ref pointnet2_module.py:51-59). Returns (B,N1,·).
        """
        _, xyz_diff, feat2_grouped, _, _ = grouping(
            feat2,
            self.nsample,
            xyz2,
            xyz1,
            raw_src_xyz=raw_xyz2,
            raw_q_xyz=raw_xyz1,
        )
        net = jnp.concatenate([feat2_grouped, xyz_diff], axis=3)
        if len(self.mlp) > 0:
            net = PointwiseMLP(self.mlp, use_bn=True, dtype=self.dtype, name="mlp_conv")(net, train)
        feat1_new = jnp.max(net, axis=2)
        if feat1 is not None:
            feat1_new = jnp.concatenate([feat1_new, feat1], axis=2)
        if len(self.mlp2) > 0:
            feat1_new = PointwiseMLP(self.mlp2, use_bn=True, dtype=self.dtype, name="mlp2_conv")(
                feat1_new, train
            )
        return feat1_new
