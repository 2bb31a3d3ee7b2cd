"""Projection-aware (range-image) backbone modules.

Counterparts of /root/reference/src/projectPN/PPBackbone_center.py:
ProjectPointNet (:54-199), ProjSetUpconv (:202-302), ProjCostVolume
(:305-500), proj FlowPredictor (:567-607). All BN here is stateless
batch-stats norm (track_running_stats=False semantics, ref :30) and the
ProjectPointNet mlps use plain ReLU (ref :73 leaky_relu=False) while the
other modules use LeakyReLU(0.1).

TPU shape discipline: grids stay (B, H, W, C); neighbor structure comes
from window_neighbor_select (static kH x kW windows + top-K) and all
gathers are single flattened XLA gathers.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from i2pnet_tpu.nn.costvolume import _mean_std_normalize
from i2pnet_tpu.nn.layers import PointwiseConv, PointwiseMLP
from i2pnet_tpu.ops.pointops import grouping, safe_norm
from i2pnet_tpu.ops.projection import (
    check_valid,
    select_window_features_multi,
    strided_downsample,
    window_neighbor_select_grid,
)


def proj_dense_eval_mode(train: bool, batch: Optional[int] = None):
    """Trace-time gate for the dense-eval ProjectPointNet path.

    Returns ``(mode, dp_axis)`` with the same guard matrix as the fused
    encoder (nn/layers.py _fused_mode — the round-4 verdict asked for the
    symmetric treatment on the eval side): "auto" engages the dense path
    at eval on single-device TPU, and on multi-device TPU ONLY under an
    ambient pure-DP mesh, where the selection-multiplicity pallas_call
    rides a ``jax.shard_map`` over the data axis (it is per-example, so
    no collective is needed); any other multi-device mesh falls back to
    the gathered path instead of emitting an unpartitionable pallas_call.
    I2PNET_PROJ_DENSE_EVAL=0 disables; =1 forces it on any backend
    (interpret-mode Pallas off-TPU — CPU tests only, slow); "interpret"
    forces interpret-mode kernels.

    The dense path itself is the measured eval winner (proj fwd
    158.3 -> 214.0 pairs/s bf16, BASELINE.md round-4b/4c). Training keeps
    the gathered path (dense measured slower on the train step).
    """
    if train:
        return None, None
    from i2pnet_tpu.nn.layers import _fused_mode

    return _fused_mode("I2PNET_PROJ_DENSE_EVAL", "auto", batch)


class ProjectPointNet(nn.Module):
    """Strided-grid downsampling + windowed neighbor PointNet
    (ref PPBackbone_center.py:54-199).

    center_mode=True builds the 10-D geometric feature
    [diff(3), center(3, warped frame), grouped(3, raw frame), dist(1)]
    (ref :177-187 forward_center); otherwise [diff(3), grouped_points(C)].
    """

    out_h: int
    out_w: int
    stride_h: int
    stride_w: int
    kernel_size: Tuple[int, int]
    nsample: int
    distance: float
    mlp: Sequence[int]
    use_trans: bool = True
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        xyz_raw: jnp.ndarray,
        xyz: jnp.ndarray,
        feature: jnp.ndarray,
        center_mode: bool = False,
        dist_mode: bool = False,
        using_intens: bool = False,
        raw_feat_point: bool = True,
        train: bool = False,
    ):
        B, H, W, _ = xyz.shape
        N = self.out_h * self.out_w
        dense_mode, dense_dp = (None, None)
        if self.use_bn and not self.is_initializing():
            dense_mode, dense_dp = proj_dense_eval_mode(train, B)
        if dense_mode is not None:
            # dense multiplicity-weighted eval path: no K-gathers, MLP
            # over all khw+1 slots + masked max, multiplicities from the
            # Pallas K-pass kernel (ops/dense_window.py +
            # ops/select_pallas.py; same real-number semantics as the
            # gathered path, oracle-tested). Training keeps the gathered
            # path — dense measured slower there (BASELINE.md round-4).
            from i2pnet_tpu.ops.dense_window import dense_pointnet_eval

            return dense_pointnet_eval(
                xyz_raw, xyz, feature, self.variables["params"],
                pallas_m=dense_mode, dp_axis=dense_dp,
                out_h=self.out_h, out_w=self.out_w,
                stride_h=self.stride_h, stride_w=self.stride_w,
                kernel_size=self.kernel_size, nsample=self.nsample,
                distance=self.distance, mlp=tuple(self.mlp),
                center_mode=center_mode, dist_mode=dist_mode,
                using_intens=using_intens, raw_feat_point=raw_feat_point,
                use_trans=self.use_trans, dtype=self.dtype,
            )
        new_xyz = strided_downsample(xyz, self.out_h, self.out_w, self.stride_h, self.stride_w)
        new_xyz_raw = strided_downsample(xyz_raw, self.out_h, self.out_w, self.stride_h, self.stride_w)

        # regular-grid fast path: windows are shifted strided slices, no
        # random gathers (47 -> ~3 ms at the 64x1800 level-1 select)
        xyz_pr = xyz if self.use_trans else xyz_raw
        qstride = (self.stride_h, self.stride_w)
        wargs = dict(
            out_h=self.out_h, out_w=self.out_w, qstride=qstride,
            stride=(1, 1), kernel_size=self.kernel_size, shift=True,
        )
        args, _ = window_neighbor_select_grid(
            xyz_pr, xyz_pr, self.out_h, self.out_w, qstride, self.kernel_size,
            self.nsample, stride=(1, 1), distance=self.distance, shift=True,
            copy=True,
        )
        src = xyz_raw if raw_feat_point else xyz
        ctr = new_xyz_raw if raw_feat_point else new_xyz
        # per-tensor selects (packed variant measured -30%, BASELINE.md r4)
        grouped_points, grouped_xyz = select_window_features_multi(
            [feature, src], args, **wargs)
        grouped_norm = grouped_xyz - ctr.reshape(B, N, 1, 3)

        if center_mode:
            # center uses the WARPED grid even with raw_feat_point (ref :178)
            center_points = jnp.broadcast_to(
                new_xyz.reshape(B, N, 1, 3), grouped_xyz.shape
            )
            dist = safe_norm(grouped_norm, axis=-1, keepdims=True)
            parts = [grouped_norm, center_points, grouped_xyz, dist]
            if using_intens:
                parts.append(grouped_points)
            new_points = jnp.concatenate(parts, axis=-1)
        elif dist_mode:
            # distance-only features (ref PPBackbone_dist.py:143-153
            # forward_dist with featmode='dist')
            new_points = safe_norm(grouped_norm, axis=-1, keepdims=True)
        else:
            new_points = jnp.concatenate([grouped_norm, grouped_points], axis=-1)

        new_points = PointwiseMLP(
            self.mlp, use_bn=self.use_bn, activation="relu", bn_stats=False,
            dtype=self.dtype, name="mlp_convs",
        )(new_points, train)
        new_feat = jnp.max(new_points, axis=2).reshape(B, self.out_h, self.out_w, -1)
        return new_xyz_raw, new_xyz, new_feat


class ProjSetUpconv(nn.Module):
    """Windowed coarse->fine feature upsampling
    (ref PPBackbone_center.py:202-302 ProjSetUpconvModule)."""

    out_h: int
    out_w: int
    stride_h: int  # coarse-grid strides relative to the fine grid
    stride_w: int
    kernel_size: Tuple[int, int]
    nsample: int
    distance: float
    mlp: Sequence[int]
    mlp2: Sequence[int]
    use_trans: bool = True
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        xyz1_raw: jnp.ndarray,
        xyz2_raw: jnp.ndarray,
        xyz1: jnp.ndarray,
        xyz2: jnp.ndarray,
        feat1: Optional[jnp.ndarray],
        feat2: jnp.ndarray,
        raw_feat_point: bool = True,
        dist_mode: bool = False,
        train: bool = False,
    ) -> jnp.ndarray:
        """xyz1*: (B, out_h, out_w, 3) fine; xyz2*: (B, h2, w2, 3) coarse;
        feat1 (B, out_h, out_w, C1) or None; feat2 (B, h2, w2, C2).
        Returns (B, out_h*out_w, mlp2[-1])."""
        B = xyz1.shape[0]
        N = self.out_h * self.out_w
        xyz1_pr = xyz1 if self.use_trans else xyz1_raw
        xyz2_pr = xyz2 if self.use_trans else xyz2_raw
        wargs = dict(
            out_h=self.out_h, out_w=self.out_w, qstride=(1, 1),
            stride=(self.stride_h, self.stride_w),
            kernel_size=self.kernel_size, shift=True,
        )
        args, _ = window_neighbor_select_grid(
            xyz1_pr, xyz2_pr, self.out_h, self.out_w, (1, 1),
            self.kernel_size, self.nsample,
            stride=(self.stride_h, self.stride_w), distance=self.distance,
            shift=True, copy=True,
        )
        src2 = xyz2_raw if raw_feat_point else xyz2
        ctr1 = xyz1_raw if raw_feat_point else xyz1
        grouped_xyz, grouped_feat2 = select_window_features_multi(
            [src2, feat2], args, **wargs)
        diff = grouped_xyz - ctr1.reshape(B, N, 1, 3)
        if dist_mode:
            # distance-only geometry (ref PPBackbone_dist.py:295-297)
            geom = safe_norm(diff, axis=-1, keepdims=True)
        else:
            geom = diff
        net = jnp.concatenate([grouped_feat2, geom], axis=3)
        if len(self.mlp) > 0:
            net = PointwiseMLP(
                self.mlp, use_bn=self.use_bn, bn_stats=False, dtype=self.dtype,
                name="mlp_conv",
            )(net, train)
        feat1_new = jnp.max(net, axis=2).reshape(B, self.out_h, self.out_w, -1)
        if feat1 is not None:
            feat1_new = jnp.concatenate([feat1_new, feat1], axis=3)
        if len(self.mlp2) > 0:
            feat1_new = PointwiseMLP(
                self.mlp2, use_bn=self.use_bn, bn_stats=False, dtype=self.dtype,
                name="mlp2_conv",
            )(feat1_new, train)
        return feat1_new.reshape(B, N, -1)


class ProjCostVolume(nn.Module):
    """2D-3D cost volume on the range grid (ref PPBackbone_center.py:305-500).

    Image side == free-point CostVolume with validity-masked backward
    validation; the 3D side aggregates over windowed grid neighbors with a
    valid-masked softmax (ref :441-487).
    """

    H: int
    W: int
    kernel_size: Tuple[int, int]
    distance: float
    nsample: int
    nsample_q: int
    mlp1: Sequence[int]
    mlp2: Sequence[int]
    backward_validation: bool = False
    use_trans: bool = True
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        xyz_raw: jnp.ndarray,
        warped_xyz: jnp.ndarray,
        warped_points: jnp.ndarray,
        idx_n2: jnp.ndarray,
        f2_xyz: jnp.ndarray,
        f2_points: jnp.ndarray,
        lidar_z: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        """xyz_raw: (B,H,W,3) raw grid; warped_xyz: (B,H*W,3) normalized-
        plane coords; warped_points: (B,H*W,C); f2_*: image pixels;
        lidar_z: (B,H*W,1). Returns (B, H, W, mlp2[-1])."""
        B, N = warped_xyz.shape[0], warped_xyz.shape[1]

        if self.nsample_q > 0:
            qi_xyz_grouped, _, qi_points_grouped, _, _ = grouping(
                f2_points, self.nsample_q, f2_xyz, warped_xyz
            )
        else:
            qi_xyz_grouped = jnp.broadcast_to(
                f2_xyz[:, None, :, :], (B, N, f2_xyz.shape[1], 3)
            )
            qi_points_grouped = jnp.broadcast_to(
                f2_points[:, None, :, :],
                (B, N, f2_points.shape[1], f2_points.shape[-1]),
            )

        warped_xyz = warped_xyz * lidar_z  # restore depth (ref :378)
        K = qi_xyz_grouped.shape[2]
        pi_xyz_expanded = jnp.broadcast_to(warped_xyz[:, :, None, :], (B, N, K, 3))
        pi_points_expanded = jnp.broadcast_to(
            warped_points[:, :, None, :], (B, N, K, warped_points.shape[-1])
        )
        pi_xyz_diff_concat = jnp.concatenate([pi_xyz_expanded, qi_xyz_grouped], 3)

        pi_points_norm = _mean_std_normalize(pi_points_expanded)
        qi_points_norm = _mean_std_normalize(qi_points_grouped)
        pi_feat_diff = pi_points_norm * qi_points_norm
        pi_feat1_new = jnp.concatenate([pi_xyz_diff_concat, pi_feat_diff], 3)

        if self.backward_validation:
            # round-5 negative: the factored form of this masked max
            # measured slower in situ (see nn/costvolume.py + BASELINE.md)
            repeat_correlation = qi_points_norm * pi_points_norm
            valid_mask = check_valid(warped_xyz)[..., None]  # (B,N,1,1)
            masked = repeat_correlation * valid_mask + -1e10 * (1 - valid_mask)
            image_max_respond = jnp.max(masked, axis=1, keepdims=True)
            image_max_respond = jnp.broadcast_to(
                image_max_respond, (B, N) + image_max_respond.shape[2:]
            )
            pi_feat1_new = jnp.concatenate([pi_feat1_new, image_max_respond], -1)

        pi_feat1_new = PointwiseMLP(
            self.mlp1, use_bn=self.use_bn, bn_stats=False, dtype=self.dtype,
            name="mlp1_convs",
        )(pi_feat1_new, train)
        pi_xyz_encoding = PointwiseConv(
            self.mlp1[-1], use_bn=self.use_bn, bn_stats=False,
            dtype=self.dtype, name="pi_encoding"
        )(pi_xyz_diff_concat, train)
        pi_concat = jnp.concatenate([pi_xyz_encoding, pi_feat1_new], 3)
        pi_concat = PointwiseMLP(
            self.mlp2, use_bn=self.use_bn, bn_stats=False, dtype=self.dtype,
            name="mlp2_convs",
        )(pi_concat, train)
        WQ = jax.nn.softmax(pi_concat, axis=2)
        pi_feat1_new = jnp.sum(WQ * pi_feat1_new, axis=2)  # (B,N,mlp1[-1])

        # --- 3D side: windowed grid neighbors with valid-masked softmax
        warped_grid = warped_xyz.reshape(B, self.H, self.W, 3)
        xyz_pr = warped_grid if self.use_trans else xyz_raw
        wargs = dict(
            out_h=self.H, out_w=self.W, qstride=(1, 1), stride=(1, 1),
            kernel_size=self.kernel_size, shift=True,
        )
        args, valid_mask = window_neighbor_select_grid(
            xyz_pr, xyz_pr, self.H, self.W, (1, 1), self.kernel_size,
            self.nsample, stride=(1, 1), distance=self.distance, shift=True,
            copy=False,
        )
        pc_xyz_grouped, pc_points_grouped = select_window_features_multi(
            [warped_grid, pi_feat1_new.reshape(B, self.H, self.W, -1)],
            args, **wargs,
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
            [pc_xyz_new, pc_xyz_grouped, pc_xyz_diff, pc_euc_diff], 3
        )
        pc_xyz_encoding = PointwiseConv(
            self.mlp1[-1], use_bn=self.use_bn, bn_stats=False,
            dtype=self.dtype, name="pc_encoding"
        )(pc_xyz_diff_concat, train)
        pc_concat = jnp.concatenate(
            [pc_xyz_encoding, pc_points_new, pc_points_grouped], -1
        )
        pc_concat = PointwiseMLP(
            self.mlp2, use_bn=self.use_bn, bn_stats=False, dtype=self.dtype,
            name="mlp2_convs_2",
        )(pc_concat, train)
        pc_concat = pc_concat * valid_mask + -1e10 * (1 - valid_mask)
        WP = jax.nn.softmax(pc_concat, axis=2)
        pc_feat1_new = jnp.sum(WP * pc_points_grouped, axis=2)
        return pc_feat1_new.reshape(B, self.H, self.W, -1)


class ProjFlowPredictor(nn.Module):
    """FlowPredictor with stateless BN (ref PPBackbone_center.py:567-607)."""

    mlp: Sequence[int]
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        points_f1: jnp.ndarray,
        upsampled_feat: Optional[jnp.ndarray],
        cost_volume: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        if upsampled_feat is not None:
            x = jnp.concatenate([points_f1, cost_volume, upsampled_feat], -1)
        else:
            x = jnp.concatenate([points_f1, cost_volume], -1)
        return PointwiseMLP(
            self.mlp, use_bn=self.use_bn, bn_stats=False, dtype=self.dtype,
            name="mlp_conv",
        )(x, train)
