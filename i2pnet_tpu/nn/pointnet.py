"""PointNet++ set-abstraction layer (ref /root/reference/pointnet_util.py:257-314).

TPU-first: grouping is one gather + one Dense stack over (B, S, K, C) —
XLA flattens it onto the MXU — followed by a max over K. The SA mlp uses
plain ReLU (ref pointnet_util.py:306), unlike the LeakyReLU elsewhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from i2pnet_tpu.nn.layers import batch_norm
from i2pnet_tpu.ops.pointops import sample_and_group


class PointNetSetAbstraction(nn.Module):
    npoint: int
    nsample: int
    mlp: Sequence[int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        points: Optional[jnp.ndarray],
        *,
        sample_idx: Optional[jnp.ndarray] = None,
        feat_mode: Optional[str] = None,
        raw_xyz: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """xyz: (B, N, 3); points: (B, N, D) or None.

        Returns (new_xyz (B,S,3), new_feat (B,S,mlp[-1]), fps_idx (B,S),
        new_raw_xyz (B,S,3) or None).
        """
        new_xyz, new_points, fps_idx, new_raw_xyz = sample_and_group(
            self.npoint,
            self.nsample,
            xyz,
            points,
            sample_idx=sample_idx,
            raw_xyz=raw_xyz,
            feat_mode=feat_mode,
        )
        for f in self.mlp:
            new_points = nn.Dense(f, dtype=self.dtype)(new_points)
            new_points = batch_norm(train)(new_points.astype(jnp.float32))
            new_points = nn.relu(new_points)
        new_feat = jnp.max(new_points, axis=2)
        return new_xyz, new_feat, fps_idx, new_raw_xyz
