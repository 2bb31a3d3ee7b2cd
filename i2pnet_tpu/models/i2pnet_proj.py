"""Projection-aware I2PNet (ref /root/reference/src/modellearn_proj_center.py
:24-424 RegNet_v2 and the 6-iteration variant modellearn_proj_center_iter.py
:346-407).

Large-range registration: the raw cloud (up to 150k points) is rasterized to
a (init_H, init_W) spherical range image in-forward, the lidar pyramid uses
strided-grid decimation + windowed neighbor gathers (the reference's
fused_conv_select_k CUDA kernel) instead of FPS/KNN, and empty cells are
handled by -1e10 logit masking.

cfg.refine_iters > 1 re-runs the l3 refinement stage, re-warping the l3
points with the previous residual pose each pass (shared weights).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from i2pnet_tpu.config import I2PNetProjConfig
from i2pnet_tpu.models.i2pnet import change_intrinsic, set_id_grid
from i2pnet_tpu.nn.heads import PoseHead
from i2pnet_tpu.nn.layers import RGBEncoder
from i2pnet_tpu.nn.proj_backbone import (
    ProjCostVolume,
    ProjFlowPredictor,
    ProjSetUpconv,
    ProjectPointNet,
)
from i2pnet_tpu.ops import quaternion as Q
from i2pnet_tpu.ops.projection import check_valid, grid_indices, spherical_project


class I2PNetProj(nn.Module):
    cfg: I2PNetProjConfig
    eval_info: bool = False

    @nn.compact
    def __call__(
        self,
        rgb_img: jnp.ndarray,
        lidar_xyz: jnp.ndarray,
        raw_xyz: jnp.ndarray,
        intrinsic: jnp.ndarray,
        lidar_feature: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        """rgb_img (B,H,W,3); lidar_xyz (B,N,3) decalibrated cloud (camera
        frame); raw_xyz (B,N,3) raw cloud driving the range-image geometry;
        intrinsic (B,3,3); lidar_feature (B,N,C) optional (e.g. normals).
        Zero-padded points are ignored by the projection.
        """
        cfg = self.cfg
        B, H, W, _ = rgb_img.shape
        Hs, Ws = cfg.lidar_Hs, cfg.lidar_Ws
        mlps = cfg.lidar_encoder_mlps
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        # ---- image branch (ref :230-238)
        rgb_feats = RGBEncoder(
            cfg.rgb_encoder_channels,
            dtype=cdt,
            bn_compute_dtype=cfg.encoder_bn_compute_dtype,
            remat=cfg.encoder_remat,
            spmd_pool=cfg.spatial_parallel,
            name="rgb_encoder",
        )(rgb_img, train)
        RF3 = rgb_feats[-1]
        h3, w3 = RF3.shape[1], RF3.shape[2]
        RF3_index = set_id_grid(h3, w3, B)
        intrinsic3 = change_intrinsic(intrinsic.astype(jnp.float32), (h3, w3), (H, W))
        RF3_index = jnp.einsum(
            "bij,bnj->bni", jnp.linalg.inv(intrinsic3), RF3_index,
            precision=jax.lax.Precision.HIGHEST,
        )
        RF3_flat = RF3.reshape(B, h3 * w3, RF3.shape[-1])

        # ---- spherical projection (ref :247-250 project_seq)
        feats0 = (
            lidar_feature
            if lidar_feature is not None
            else jnp.zeros((B, lidar_xyz.shape[1], 3), lidar_xyz.dtype)
        )
        raw_grid, (norm_grid, xyz_grid) = spherical_project(
            raw_xyz,
            [feats0, lidar_xyz],
            cfg.init_H,
            cfg.init_W,
            cfg.fup,
            cfg.fdown,
            use_rank=cfg.rank,
            ref_pad_quirk=cfg.ref_pad_quirk,
        )

        # ---- lidar pyramid (ref :256-259)
        def make_lv(i, nsample, mlp, name):
            return ProjectPointNet(
                out_h=Hs[i],
                out_w=Ws[i],
                stride_h=cfg.stride_Hs[i],
                stride_w=cfg.stride_Ws[i],
                kernel_size=cfg.kernel_sizes[i],
                nsample=nsample,
                distance=cfg.down_conv_dis[i],
                mlp=mlp,
                use_trans=cfg.use_trans,
                use_bn=cfg.use_bn_p,
                dtype=cdt,
                name=name,
            )

        rf = cfg.raw_feat_point
        P1_raw, P1, LF1 = make_lv(0, cfg.lidar_group_samples[0], mlps[0], "lidar_lv1")(
            raw_grid, xyz_grid, norm_grid, center_mode=True,
            using_intens=cfg.using_intens, raw_feat_point=rf, train=train,
        )
        P2_raw, P2, LF2 = make_lv(1, cfg.lidar_group_samples[1], mlps[1], "lidar_lv2")(
            P1_raw, P1, LF1, raw_feat_point=rf, train=train
        )
        P3_raw, P3, LF3 = make_lv(2, cfg.lidar_group_samples[2], mlps[2], "lidar_lv3")(
            P2_raw, P2, LF2, raw_feat_point=rf, train=train
        )
        P4_raw, P4, LF4 = make_lv(3, cfg.lidar_group_samples[3], mlps[3], "lidar_lv4")(
            P3_raw, P3, LF3, raw_feat_point=rf, train=train
        )

        H3, W3 = Hs[2], Ws[2]
        H4, W4 = Hs[3], Ws[3]
        P3_l4 = P3.reshape(B, H3 * W3, 3)
        LF3_flat = LF3.reshape(B, H3 * W3, -1)
        l3_idx_n2 = grid_indices(B, H3, W3)

        lidar_z = P3_l4[:, :, 2:]
        lidar_uv = P3_l4 / (lidar_z + 1e-10)

        # ---- cost volume 1 (ref :304-305)
        concat_4 = ProjCostVolume(
            H=H3, W=W3,
            kernel_size=cfg.cost_volume_kernel_size[0],
            distance=cfg.cost_volume_dis[0],
            nsample=cfg.cost_volume_nsample,
            nsample_q=cfg.cost_volume_nsamples_q[0],
            mlp1=cfg.cost_volume_mlps[0],
            mlp2=cfg.cost_volume_mlps[1],
            backward_validation=cfg.backward_validation[0],
            use_trans=cfg.use_trans,
            use_bn=cfg.use_bn_p,
            dtype=cdt,
            name="cost_volume1",
        )(P3_raw, lidar_uv, LF3_flat, l3_idx_n2, RF3_index, RF3_flat, lidar_z, train)

        # ---- resample to l4 (ref :309)
        _, _, l4_points_predict = ProjectPointNet(
            out_h=H4, out_w=W4,
            stride_h=cfg.stride_Hs[3], stride_w=cfg.stride_Ws[3],
            kernel_size=cfg.kernel_sizes[3],
            nsample=cfg.lidar_group_samples[4],
            distance=cfg.down_conv_dis[3],
            mlp=mlps[4],
            use_trans=cfg.use_trans,
            use_bn=cfg.use_bn_p,
            dtype=cdt,
            name="layer_idx",
        )(P3_raw, P3, concat_4, raw_feat_point=rf, train=train)

        l4_valid_mask = check_valid(P4_raw).reshape(B, -1, 1)
        LF4_flat = LF4.reshape(B, H4 * W4, -1)
        l4_pred_flat = l4_points_predict.reshape(B, H4 * W4, -1)

        l4_cost_volume_w = ProjFlowPredictor(
            cfg.flow_predictor_mlps[0], use_bn=cfg.use_bn_p, dtype=cdt, name="flow_predictor0"
        )(LF4_flat, None, l4_pred_flat, train)
        l4_cost_volume_w = (
            l4_cost_volume_w * l4_valid_mask + -1e10 * (1 - l4_valid_mask)
        )

        def make_head(name):
            return PoseHead(
                mlp1=(), mlp2=(),
                hidden=cfg.head_hidden_dim,
                q_dim=cfg.rotation_quat_head_dim,
                t_dim=cfg.transition_vec_head_dim,
                dropout_rate=cfg.head_dropout_rate,
                split_dp=cfg.split_dp,
                sigmoid=cfg.mask_sigmoid,
                maxhead=cfg.max_head,
                name=name,
            )

        q4, t4, _ = make_head("l4_head")(
            l4_pred_flat, l4_cost_volume_w, P4.reshape(B, H4 * W4, 3),
            LF4_flat, None, train,
        )
        out4 = jnp.concatenate([q4, t4], axis=1)

        # ---- upsample mask/embedding to l3 (ref :344-348; hoisted out of
        # the refinement loop, as in the iter variant)
        def make_upconv(i, name):
            return ProjSetUpconv(
                out_h=H3, out_w=W3,
                stride_h=cfg.stride_Hs[3], stride_w=cfg.stride_Ws[3],
                kernel_size=cfg.up_conv_kernel_size[i],
                nsample=cfg.setupconv_nsamples[i],
                distance=cfg.up_conv_dis[i],
                mlp=cfg.setupconv_mlps[i][0],
                mlp2=cfg.setupconv_mlps[i][1],
                use_trans=cfg.use_trans,
                use_bn=cfg.use_bn_p,
                dtype=cdt,
                name=name,
            )

        l3_cv_w_up = make_upconv(0, "set_upconv0_w_upsample")(
            P3_raw, P4_raw, P3, P4, LF3,
            l4_cost_volume_w.reshape(B, H4, W4, -1), raw_feat_point=rf, train=train,
        )
        l3_cv_up = make_upconv(1, "set_upconv0_upsample")(
            P3_raw, P4_raw, P3, P4, LF3, l4_points_predict,
            raw_feat_point=rf, train=train,
        )

        # ---- l3 refinement (1 pass == modellearn_proj_center; >1 ==
        # modellearn_proj_center_iter: re-warp by the previous residual)
        cost_volume2 = ProjCostVolume(
            H=H3, W=W3,
            kernel_size=cfg.cost_volume_kernel_size[1],
            distance=cfg.cost_volume_dis[1],
            nsample=cfg.cost_volume_nsample,
            nsample_q=cfg.cost_volume_nsamples_q[1],
            mlp1=cfg.cost_volume_mlps[0],
            mlp2=cfg.cost_volume_mlps[1],
            backward_validation=cfg.backward_validation[1],
            use_trans=cfg.use_trans,
            use_bn=cfg.use_bn_p,
            dtype=cdt,
            name="cost_volume2",
        )
        fp_predict = ProjFlowPredictor(
            cfg.flow_predictor_mlps[1], use_bn=cfg.use_bn_p, dtype=cdt,
            name="flow_predictor0_predict",
        )
        fp_w = ProjFlowPredictor(
            cfg.flow_predictor_mlps[2], use_bn=cfg.use_bn_p, dtype=cdt, name="flow_predictor0_w"
        )
        l3_head = make_head("l3_head")

        l3_nowarp_valid = check_valid(P3_l4)
        valid_mask_l3 = check_valid(P3_raw).reshape(B, -1, 1)

        q_iter, t_iter = q4, t4
        W_l3 = None
        for _ in range(max(cfg.refine_iters, 1)):
            P3_warped = Q.warp_points(P3_l4, q_iter, t_iter) * l3_nowarp_valid
            z_w = P3_warped[:, :, 2:]
            uv_w = P3_warped / (z_w + 1e-10)
            concat_3 = cost_volume2(
                P3_raw, uv_w, LF3_flat, l3_idx_n2, RF3_index, RF3_flat, z_w, train
            )
            l3_cv_predict = fp_predict(
                LF3_flat, l3_cv_up, concat_3.reshape(B, H3 * W3, -1), train
            )
            l3_cv_w = fp_w(LF3_flat, l3_cv_w_up, l3_cv_predict, train)
            l3_cv_w = l3_cv_w * valid_mask_l3 + -1e10 * (1 - valid_mask_l3)
            q3, t3, W_l3 = l3_head(
                l3_cv_predict, l3_cv_w, P3_warped, LF3_flat, None, train
            )
            q, t = Q.compose_pose(q3, t3, q_iter, t_iter)
            q_iter, t_iter = q3, t3  # next pass warps by the raw residual
        out3 = jnp.concatenate([q, t], axis=1)

        sq = self.param("sq", lambda k: jnp.array([cfg.sq_init], jnp.float32))
        sx = self.param("sx", lambda k: jnp.array([cfg.sx_init], jnp.float32))

        out = {
            "out3": out3.astype(jnp.float32),
            "out4": out4.astype(jnp.float32),
            "pm3": None,
            "pm4": None,
            "sx": sx,
            "sq": sq,
        }
        if self.eval_info:
            out.update({"W_l3": W_l3, "P3": P3_l4, "P4": P4.reshape(B, H4 * W4, 3)})
        return out
