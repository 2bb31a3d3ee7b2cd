"""Free-point I2PNet (ref /root/reference/src/modellearn.py:24-395 RegNet_v2).

Coarse-to-fine 2D-3D registration:
  RGB pyramid (x32) + PointNet++ pyramid -> cost volume at l3 -> resample to
  l4 -> coarse pose (q4, t4) -> warp l3 points -> second cost volume ->
  upconv refinement -> residual pose (q3, t3) -> compose.

All layouts channels-last; forward is a single jittable function of
(params, batch) with static config.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from i2pnet_tpu.config import I2PNetConfig
from i2pnet_tpu.nn.costvolume import CostVolume
from i2pnet_tpu.nn.heads import FlowPredictor, PoseHead, ProjectMask, delay_weight
from i2pnet_tpu.nn.layers import RGBEncoder
from i2pnet_tpu.nn.pointnet import PointNetSetAbstraction
from i2pnet_tpu.nn.upconv import SetUpconv
from i2pnet_tpu.ops import quaternion as Q
from i2pnet_tpu.ops.pointops import index_points


def set_id_grid(h: int, w: int, batch: int) -> jnp.ndarray:
    """Homogeneous pixel-center grid (B, H*W, 3) as (u=j, v=i, 1)
    (ref modellearn.py:398-412)."""
    j = jnp.arange(w, dtype=jnp.float32)
    i = jnp.arange(h, dtype=jnp.float32)
    jj, ii = jnp.meshgrid(j, i)  # (H, W)
    ones = jnp.ones_like(jj)
    grid = jnp.stack([jj, ii, ones], axis=-1).reshape(1, h * w, 3)
    return jnp.broadcast_to(grid, (batch, h * w, 3))


def change_intrinsic(
    intrinsic: jnp.ndarray, feat_hw: tuple, img_hw: tuple
) -> jnp.ndarray:
    """Rescale K to a downsampled feature grid (ref modellearn.py:415-421)."""
    sx = feat_hw[1] / img_hw[1]
    sy = feat_hw[0] / img_hw[0]
    scale = jnp.array(
        [[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]], dtype=intrinsic.dtype
    )
    return intrinsic * scale


class I2PNet(nn.Module):
    """Free-point registration network. Returns a dict with:

    out3 (B,7): refined [q, t] correction; out4 (B,7): coarse correction;
    pm3/pm4: optional projection-mask tuples; sx, sq: learned loss weights.
    """

    cfg: I2PNetConfig
    eval_info: bool = False

    @nn.compact
    def __call__(
        self,
        rgb_img: jnp.ndarray,
        lidar_xyz: jnp.ndarray,
        intrinsic: jnp.ndarray,
        lidar_feature: Optional[jnp.ndarray] = None,
        raw_xyz: Optional[jnp.ndarray] = None,
        gt_project: Optional[jnp.ndarray] = None,
        now_step: Optional[jnp.ndarray] = None,
        calib: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        # gt_project: (B, N, 2) one-hot in-frustum labels (ref modellearn.py
        # :262 "gt_project [B,N,2]"); subsampled through the FPS pyramid.
        #
        # calib (B, 3or4, 4): EFGH online-calibration projection matrix
        # (P_2 @ Tr). When cfg.efgh, points are in the LiDAR frame and all
        # image-plane projections go through calib (pixel frame) instead of
        # the normalized camera plane (ref warp_utils.py:97-146
        # warp_quat_EFGH / projection_initial_EFGH; the reference's model
        # never routes them — see config.efgh note — so the routing here is
        # the coherent-frame completion: lidar uv and the pixel grid both
        # live in FEATURE-pixel coordinates).
        cfg = self.cfg
        if cfg.efgh:
            if calib is None:
                raise ValueError("cfg.efgh=True requires the calib input")
            if cfg.use_projection_mask or cfg.ground_truth_projection_mask \
                    or cfg.ground_truth_projection_mask_eval:
                # the reference's harness asserts the same exclusion
                # (ref train20v2learn_wandb.py:738-740)
                raise ValueError("efgh and projection masks are exclusive")
        B, H, W, _ = rgb_img.shape
        layer_pts = cfg.lidar_layer_points
        mlps = cfg.lidar_encoder_mlps
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        if cfg.raw_feat_point and raw_xyz is None:
            raw_xyz = lidar_xyz
        if now_step is None:
            # fresh reference models start the delay counter at delay_step
            # (ref MainModules.py:429 DelayWeight.now_step init)
            now_step = jnp.asarray(cfg.mask_delay_step, jnp.float32)

        # ---- image branch (ref modellearn.py:190-197)
        rgb_feats = RGBEncoder(
            cfg.rgb_encoder_channels,
            dtype=cdt,
            bn_compute_dtype=cfg.encoder_bn_compute_dtype,
            remat=cfg.encoder_remat,
            spmd_pool=cfg.spatial_parallel,
            name="rgb_encoder",
        )(rgb_img, train)
        RF3 = rgb_feats[-1]  # (B, h3, w3, C)
        h3, w3 = RF3.shape[1], RF3.shape[2]
        RF3_index = set_id_grid(h3, w3, B)

        # ---- lidar pyramid (ref :209-215)
        feats0 = (
            lidar_feature
            if lidar_feature is not None
            else jnp.zeros((B, lidar_xyz.shape[1], 3), lidar_xyz.dtype)
        )
        sa_kw = dict(train=train)
        P1, LF1, fps1, P1_raw = PointNetSetAbstraction(
            layer_pts[0], cfg.lidar_group_samples[0], mlps[0], dtype=cdt, name="lidar_lv1"
        )(lidar_xyz, feats0, feat_mode=cfg.featmode, raw_xyz=raw_xyz, **sa_kw)
        P2, LF2, fps2, P2_raw = PointNetSetAbstraction(
            layer_pts[1], cfg.lidar_group_samples[1], mlps[1], dtype=cdt, name="lidar_lv2"
        )(P1, LF1, raw_xyz=P1_raw, **sa_kw)
        P3, LF3, fps3, P3_raw = PointNetSetAbstraction(
            layer_pts[2], cfg.lidar_group_samples[2], mlps[2], dtype=cdt, name="lidar_lv3"
        )(P2, LF2, raw_xyz=P2_raw, **sa_kw)
        P4, LF4, fps4, P4_raw = PointNetSetAbstraction(
            layer_pts[3], cfg.lidar_group_samples[3], mlps[3], dtype=cdt, name="lidar_lv4"
        )(P3, LF3, raw_xyz=P3_raw, **sa_kw)

        calib3 = None
        if cfg.efgh:
            # scale the projection matrix to the feature grid exactly like
            # change_intrinsic scales K (row 0 by w3/W, row 1 by h3/H): the
            # lidar projections and the raw pixel grid then share the
            # FEATURE-pixel frame, the efgh analogue of the normalized
            # camera plane
            scale = jnp.asarray(
                [[w3 / W], [h3 / H], [1.0]], jnp.float32
            )
            calib3 = calib[:, :3, :].astype(jnp.float32) * scale
            # RF3_index stays the raw homogeneous pixel grid (u, v, 1)
            lidar_uv, lidar_z = Q.project_with_calib(P3, calib3)
        else:
            # ---- pixel grid to normalized camera plane (ref :220-226; the
            # reference's CPU torch.inverse workaround disappears — jnp
            # inverts the 3x3 on device)
            intrinsic3 = change_intrinsic(
                intrinsic.astype(jnp.float32), (h3, w3), (H, W)
            )
            intrinsic3_inv = jnp.linalg.inv(intrinsic3)
            # HIGHEST: bf16 K^-1 products would shift normalized-plane pixel
            # coords by ~0.4% of the inter-pixel spacing (CLAUDE.md rule)
            RF3_index = jnp.einsum(
                "bij,bnj->bni", intrinsic3_inv, RF3_index,
                precision=jax.lax.Precision.HIGHEST,
            )

            # lidar points onto normalized plane (ref :230-232)
            lidar_uv, lidar_z = Q.project_to_normalized_plane(P3)

        RF3_flat = RF3.reshape(B, h3 * w3, RF3.shape[-1])

        # ---- cost volume 1 at l3 (ref :244)
        concat_4 = CostVolume(
            nsample=cfg.cost_volume_nsample,
            nsample_q=cfg.cost_volume_nsamples_q[0],
            mlp1=cfg.cost_volume_mlps[0],
            mlp2=cfg.cost_volume_mlps[1],
            corr_func=cfg.cost_volume_corr_func,
            backward_validation=cfg.backward_validation[0],
            max_cost=cfg.max_cost,
            backward_fc=cfg.backward_fc,
            dtype=cdt,
            name="cost_volume1",
        )(lidar_uv, LF3, RF3_index, RF3_flat, lidar_z, train)

        # ---- resample cost volume to l4 reusing fps_idx_4 (ref :248)
        P4_, l4_points_predict, _, _ = PointNetSetAbstraction(
            layer_pts[3], cfg.lidar_group_samples[4], mlps[4], dtype=cdt, name="layer_idx"
        )(P3, concat_4, sample_idx=fps4, raw_xyz=P3_raw, **sa_kw)

        l4_cost_volume_w = FlowPredictor(
            cfg.flow_predictor_mlps[0], dtype=cdt, name="flow_predictor0"
        )(LF4, None, l4_points_predict, train)

        # ---- optional l4 projection mask (ref :256-276)
        l4_projection_mask = None
        gt_l3 = gt_l4 = None
        if cfg.use_projection_mask and cfg.layer_mask[0]:
            l4_projection_mask = ProjectMask(
                cfg.projection_mask_mlps[0],
                cfg.mask_sigmoid,
                name="l4_projection_mask",
            )(LF4, l4_points_predict, train)
        if gt_project is not None:
            gt_l1 = index_points(gt_project, fps1)
            gt_l2 = index_points(gt_l1, fps2)
            gt_l3 = index_points(gt_l2, fps3)
            gt_l4 = index_points(gt_l3, fps4)
        l4_mask_for_head = l4_projection_mask
        if gt_project is not None and cfg.ground_truth_mask_layer[0]:
            if l4_projection_mask is not None:
                l4_mask_for_head = delay_weight(
                    gt_l4, l4_projection_mask, now_step, cfg.mask_delay_step,
                    cfg.ab_delay,
                )
            else:
                l4_mask_for_head = gt_l4

        # ---- coarse pose (ref :278-288)
        q4, t4, _ = PoseHead(
            mlp1=cfg.pose_head_mlps[0][0],
            mlp2=cfg.pose_head_mlps[0][1],
            hidden=cfg.head_hidden_dim,
            q_dim=cfg.rotation_quat_head_dim,
            t_dim=cfg.transition_vec_head_dim,
            dropout_rate=cfg.head_dropout_rate,
            split_dp=cfg.split_dp,
            corr_func=cfg.head_corr_func,
            pos_embed=cfg.head_pos_embedding,
            sigmoid=cfg.mask_sigmoid,
            maxhead=cfg.max_head,
            name="l4_head",
        )(l4_points_predict, l4_cost_volume_w, P4, LF4, l4_mask_for_head, train)
        out4 = jnp.concatenate([q4, t4], axis=1)

        # ---- warp l3 by the coarse pose, second cost volume (ref :292-301;
        # efgh: warp then project through calib, ref warp_utils.py:97-131)
        if cfg.efgh:
            warped_uv, warped_z = Q.warp_with_calib(P3, q4, t4, calib3)
        else:
            warped_uv, warped_z = Q.warp_to_normalized_plane(P3, q4, t4)
        concat_3 = CostVolume(
            nsample=cfg.cost_volume_nsample,
            nsample_q=cfg.cost_volume_nsamples_q[1],
            mlp1=cfg.cost_volume_mlps[0],
            mlp2=cfg.cost_volume_mlps[1],
            corr_func=cfg.cost_volume_corr_func,
            backward_validation=cfg.backward_validation[1],
            max_cost=cfg.max_cost,
            backward_fc=cfg.backward_fc,
            dtype=cdt,
            name="cost_volume2",
        )(warped_uv, LF3, RF3_index, RF3_flat, warped_z, train)

        # ---- upsample l4 mask / embedding to l3 (ref :304-315)
        up_kw = dict(train=train)
        if cfg.raw_feat_point:
            up_kw.update(raw_xyz1=P3_raw, raw_xyz2=P4_raw)
        l3_cost_volume_w_upsample = SetUpconv(
            cfg.setupconv_nsamples[0],
            cfg.setupconv_mlps[0][0],
            cfg.setupconv_mlps[0][1],
            dtype=cdt,
            name="set_upconv0_w_upsample",
        )(P3, P4, LF3, l4_cost_volume_w, **up_kw)
        l3_cost_volume_upsample = SetUpconv(
            cfg.setupconv_nsamples[1],
            cfg.setupconv_mlps[1][0],
            cfg.setupconv_mlps[1][1],
            dtype=cdt,
            name="set_upconv0_upsample",
        )(P3, P4, LF3, l4_points_predict, **up_kw)

        # ---- refined embedding and mask (ref :318-322)
        l3_cost_volume_predict = FlowPredictor(
            cfg.flow_predictor_mlps[1], dtype=cdt, name="flow_predictor0_predict"
        )(LF3, l3_cost_volume_upsample, concat_3, train)
        l3_cost_volume_w = FlowPredictor(
            cfg.flow_predictor_mlps[2], dtype=cdt, name="flow_predictor0_w"
        )(LF3, l3_cost_volume_w_upsample, l3_cost_volume_predict, train)

        # ---- optional l3 projection mask (ref :324-341)
        l3_prediction_mask = None
        if cfg.use_projection_mask and cfg.layer_mask[1]:
            l3_prediction_mask = ProjectMask(
                cfg.projection_mask_mlps[1],
                cfg.mask_sigmoid,
                name="l3_projection_mask",
            )(LF3, l3_cost_volume_predict, train)
        l3_mask_for_head = l3_prediction_mask
        if gt_project is not None and cfg.ground_truth_mask_layer[1]:
            if l3_prediction_mask is not None:
                l3_mask_for_head = delay_weight(
                    gt_l3, l3_prediction_mask, now_step, cfg.mask_delay_step,
                    cfg.ab_delay,
                )
            else:
                l3_mask_for_head = gt_l3
        if (
            not cfg.layer_mask[1]
            and cfg.ground_truth_mask_layer[1]
            and gt_project is None
        ):
            # eval-time fallback for gt-mask-trained models: synthesize the
            # mask from the coarse pose; the reference assigns it to
            # l3_prediction_mask itself, so pm3/eval_info expose it to
            # mask-accuracy and visualization consumers
            # (ref modellearn.py:338-341)
            from i2pnet_tpu.losses import get_projection_gt

            l3_prediction_mask = jax.nn.one_hot(
                get_projection_gt(P3, intrinsic, (H, W), q4, t4), 2
            )
            l3_mask_for_head = l3_prediction_mask

        # ---- residual pose (ref :344-346)
        q3, t3, W_l3 = PoseHead(
            mlp1=cfg.pose_head_mlps[1][0],
            mlp2=cfg.pose_head_mlps[1][1],
            hidden=cfg.head_hidden_dim,
            q_dim=cfg.rotation_quat_head_dim,
            t_dim=cfg.transition_vec_head_dim,
            dropout_rate=cfg.head_dropout_rate,
            split_dp=cfg.split_dp,
            corr_func=cfg.head_corr_func,
            pos_embed=cfg.head_pos_embedding,
            sigmoid=cfg.mask_sigmoid,
            maxhead=cfg.max_head,
            name="l3_head",
        )(l3_cost_volume_predict, l3_cost_volume_w, P3, LF3, l3_mask_for_head, train)

        # ---- compose q = q3*q4, t = R3 t4 + t3 (ref :357-373)
        q, t = Q.compose_pose(q3, t3, q4, t4)
        out3 = jnp.concatenate([q, t], axis=1)

        # ---- learned homoscedastic loss weights (ref :166-168)
        sq = self.param("sq", lambda k: jnp.array([cfg.sq_init], jnp.float32))
        sx = self.param("sx", lambda k: jnp.array([cfg.sx_init], jnp.float32))

        pm3 = None
        if l3_prediction_mask is not None:
            pm3 = (l3_prediction_mask, P3, gt_l3)
        pm4 = None
        if l4_projection_mask is not None and not cfg.one_head_mask:
            pm4 = (l4_projection_mask, P4, gt_l4)

        out = {
            "out3": out3.astype(jnp.float32),
            "out4": out4.astype(jnp.float32),
            "pm3": pm3,
            "pm4": pm4,
            "sx": sx,
            "sq": sq,
        }
        if self.eval_info:
            out.update({"W_l3": W_l3, "P3": P3, "P4": P4})
        return out
