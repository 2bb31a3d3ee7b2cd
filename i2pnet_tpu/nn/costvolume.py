"""2D-3D cost volume (ref /root/reference/src/modules/MainModules.py:51-242).

The core soft-correspondence module: each (warped) LiDAR point attends over
image pixels (treated as normalized-plane 3D points), then the per-point
embeddings are smoothed by attention over a 3D KNN neighborhood.

TPU notes:
  * nsample_q == -1 ("all pixels") keeps the pixel set as a broadcast view
    (B, 1, HW, C) — no repeat materialization; the elementwise-product
    correlation and Dense stacks then fuse into large MXU matmuls;
  * the backward-validation max over points reuses the already-normalized
    features — computed once;
  * feature mean/std normalization uses ddof=1 to match torch.std.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from i2pnet_tpu.nn.layers import PointwiseConv, PointwiseMLP
from i2pnet_tpu.ops.pointops import grouping, safe_norm


def _mean_std_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Per-vector mean/std normalization over channels (ddof=1, torch.std)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(x.shape[-1] - 1, 1)
    std = jnp.sqrt(var)
    return (x - mean) / jnp.clip(std, min=eps)


class CostVolume(nn.Module):
    """ref MainModules.py:51 CostVolume.

    Attributes mirror the reference constructor; channel sizes are inferred
    by flax so only the mlp widths are needed.
    """

    nsample: int  # 3D neighborhood size (ref :47 cost_volume_nsamples[0])
    nsample_q: int  # image pixels per point; -1 = all pixels
    mlp1: Sequence[int]
    mlp2: Sequence[int]
    corr_func: str = "elementwise_product"  # | concat | cosine
    backward_validation: bool = False
    max_cost: bool = False
    backward_fc: bool = False
    dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(
        self,
        warped_xyz: jnp.ndarray,
        warped_points: jnp.ndarray,
        f2_xyz: jnp.ndarray,
        f2_points: jnp.ndarray,
        lidar_z: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        """warped_xyz (B,N,3) normalized-plane points; warped_points (B,N,C)
        LiDAR features; f2_xyz (B,M,3) pixel plane coords; f2_points (B,M,C)
        image features; lidar_z (B,N,1) depths. Returns (B,N,mlp2[-1]).
        """
        B, N, _ = warped_xyz.shape

        if self.nsample_q > 0:
            qi_xyz_grouped, _, qi_points_grouped, _, _ = grouping(
                f2_points, self.nsample_q, f2_xyz, warped_xyz
            )
        else:
            # all pixels: broadcast views, no copies (ref :133-138)
            qi_xyz_grouped = jnp.broadcast_to(
                f2_xyz[:, None, :, :], (B, N, f2_xyz.shape[1], 3)
            )
            qi_points_grouped = jnp.broadcast_to(
                f2_points[:, None, :, :],
                (B, N, f2_points.shape[1], f2_points.shape[-1]),
            )

        # restore depth (ref :141)
        warped_xyz = warped_xyz * lidar_z

        pi_feat1_new = None
        if (
            not self.is_initializing()
            and not train
            and self.nsample_q <= 0
            and self.corr_func == "elementwise_product"
            and not self.max_cost
            and not self.backward_fc
            and self.dtype == jnp.bfloat16
        ):
            # fused eval pi-side: BN folded to affine at eval, the whole
            # corr -> mlp1 -> (pi_encoding ++) -> mlp2 -> softmax-sum chain
            # runs per-query in VMEM — no (B, N, K, C) HBM tensors
            # (ops/cv_pallas.py; standard multi-device guard matrix).
            # Training keeps the native path (train BN needs batch stats).
            from i2pnet_tpu.nn.layers import _fused_mode
            from i2pnet_tpu.ops.cv_pallas import (
                fused_cv1_eval,
                fused_cv1_eval_supported,
            )

            mode, dp_axis = _fused_mode("I2PNET_FUSED_CV", "auto", B)
            if mode is not None and fused_cv1_eval_supported(
                tuple(self.mlp1), tuple(self.mlp2), warped_points.shape[-1]
            ):
                v = self.variables
                pi_feat1_new = fused_cv1_eval(
                    warped_xyz, warped_points, f2_xyz, f2_points,
                    v["params"], v["batch_stats"],
                    bval=self.backward_validation,
                    interpret=(mode == "interpret"), dp_axis=dp_axis,
                )

        if pi_feat1_new is None:
            K = qi_xyz_grouped.shape[2]
            pi_xyz_expanded = jnp.broadcast_to(
                warped_xyz[:, :, None, :], (B, N, K, 3)
            )
            pi_points_expanded = jnp.broadcast_to(
                warped_points[:, :, None, :], (B, N, K, warped_points.shape[-1])
            )

            # position pair encoding input (ref :154)
            pi_xyz_diff_concat = jnp.concatenate(
                [pi_xyz_expanded, qi_xyz_grouped], axis=3
            )

            if self.corr_func == "elementwise_product":
                pi_points_norm = _mean_std_normalize(pi_points_expanded)
                qi_points_norm = _mean_std_normalize(qi_points_grouped)
                pi_feat_diff = pi_points_norm * qi_points_norm
            elif self.corr_func == "concat":
                pi_points_norm = pi_points_expanded
                qi_points_norm = qi_points_grouped
                pi_feat_diff = jnp.concatenate(
                    [pi_points_expanded, qi_points_grouped], axis=-1
                )
            elif self.corr_func == "cosine":
                pi_points_norm = pi_points_expanded / jnp.clip(
                    safe_norm(pi_points_expanded, axis=-1, keepdims=True), min=1e-12
                )
                qi_points_norm = qi_points_grouped / jnp.clip(
                    safe_norm(qi_points_grouped, axis=-1, keepdims=True), min=1e-12
                )
                pi_feat_diff = pi_points_norm * qi_points_norm
            else:
                raise NotImplementedError(self.corr_func)

            pi_feat1_new = jnp.concatenate([pi_xyz_diff_concat, pi_feat_diff], axis=3)

            if self.backward_validation:
                # image -> lidar max response over all points (ref :178-190).
                # Round-5 negative (BASELINE.md): algebraically factoring this
                # max out of (B,N,K,C) via qi>=0 ? qi*max_n(pi) : qi*min_n(pi)
                # measured SLOWER in situ (train step 67.3 -> 69.8/70.4 ms,
                # fwd 22.5 -> 23.7 ms) — the product is materialized for
                # pi_feat_diff anyway and XLA fuses this max into that pass,
                # while the factored form costs an extra broadcast
                # materialization at the concat. Same lesson as im2col: A/B
                # inside the full step before routing a "cheaper" subgraph.
                repeat_correlation = qi_points_norm * pi_points_norm
                image_max_respond = jnp.max(repeat_correlation, axis=1, keepdims=True)
                if self.backward_fc:
                    image_max_respond = PointwiseConv(
                        image_max_respond.shape[-1], use_bn=True
                    )(image_max_respond, train)
                image_max_respond = jnp.broadcast_to(
                    image_max_respond, (B, N) + image_max_respond.shape[2:]
                )
                pi_feat1_new = jnp.concatenate(
                    [pi_feat1_new, image_max_respond], axis=-1
                )

            pi_feat1_new = PointwiseMLP(self.mlp1, use_bn=True, dtype=self.dtype, name="mlp1_convs")(
                pi_feat1_new, train
            )

            pi_xyz_encoding = PointwiseConv(
                self.mlp1[-1], use_bn=True, dtype=self.dtype, name="pi_encoding"
            )(pi_xyz_diff_concat, train)

            if not self.max_cost:
                pi_concat = jnp.concatenate([pi_xyz_encoding, pi_feat1_new], axis=3)
                pi_concat = PointwiseMLP(self.mlp2, use_bn=True, dtype=self.dtype, name="mlp2_convs")(
                    pi_concat, train
                )
                WQ = jax.nn.softmax(pi_concat, axis=2)
                pi_feat1_new = jnp.sum(WQ * pi_feat1_new, axis=2)
            else:
                pi_feat1_new = jnp.max(pi_feat1_new, axis=2)

        # --- 3D neighborhood attention over lidar points (ref :213-240)
        pc_xyz_grouped, _, pc_points_grouped, _, _ = grouping(
            pi_feat1_new, self.nsample, warped_xyz, warped_xyz
        )
        pc_xyz_new = jnp.broadcast_to(
            warped_xyz[:, :, None, :], (B, N, self.nsample, 3)
        )
        pc_points_new = jnp.broadcast_to(
            warped_points[:, :, None, :],
            (B, N, self.nsample, warped_points.shape[-1]),
        )
        pc_xyz_diff = pc_xyz_grouped - pc_xyz_new
        pc_euc_diff = jnp.sqrt(
            jnp.sum(pc_xyz_diff * pc_xyz_diff, axis=3, keepdims=True) + 1e-20
        )
        pc_xyz_diff_concat = jnp.concatenate(
            [pc_xyz_new, pc_xyz_grouped, pc_xyz_diff, pc_euc_diff], axis=3
        )
        pc_xyz_encoding = PointwiseConv(
            self.mlp1[-1], use_bn=True, dtype=self.dtype, name="pc_encoding"
        )(pc_xyz_diff_concat, train)

        pc_concat = jnp.concatenate(
            [pc_xyz_encoding, pc_points_new, pc_points_grouped], axis=-1
        )
        pc_concat = PointwiseMLP(self.mlp2, use_bn=True, dtype=self.dtype, name="mlp2_convs_2")(
            pc_concat, train
        )
        WP = jax.nn.softmax(pc_concat, axis=2)
        return jnp.sum(WP * pc_points_grouped, axis=2)
