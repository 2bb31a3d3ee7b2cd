"""Training losses (ref /root/reference/compute_loss.py).

All pure jnp; usable inside the jitted train step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from i2pnet_tpu.ops import quaternion as Q


def get_projection_gt(
    pcl: jnp.ndarray,
    K: jnp.ndarray,
    img_size: Tuple[int, int],
    decalib_q: jnp.ndarray,
    decalib_t: jnp.ndarray,
) -> jnp.ndarray:
    """Per-point in-frustum labels (ref src/utils.py:57-104 get_projection_gt).

    pcl (B,N,3), K (B,3,3), img_size (H, W). Returns int32 (B,N) in {0,1}.
    """
    E = Q.pose_to_matrix(decalib_q, decalib_t)  # (B,3,4)
    # HIGHEST: TPU matmuls default to bf16; rounding on meter-scale cam
    # coords and K products flips in-frustum labels at image borders
    cam = jnp.einsum("bij,bnj->bni", E[:, :, :3], pcl,
                     precision=jax.lax.Precision.HIGHEST) + E[:, None, :, 3]
    uvw = jnp.einsum("bij,bnj->bni", K.astype(cam.dtype), cam,
                     precision=jax.lax.Precision.HIGHEST)
    z = uvw[..., 2]
    uv = uvw / (z[..., None] + 1e-10)
    u, v = uv[..., 0], uv[..., 1]
    inliers = (
        (u >= 0) & (u <= img_size[1]) & (v >= 0) & (v <= img_size[0]) & (z >= 0.1)
    )
    return inliers.astype(jnp.int32)


def focal_loss(pred: jnp.ndarray, gt: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Focal CE: mean over flattened points (ref compute_loss.py:7-16).

    pred (M, C) logits; gt (M,) int labels.
    """
    log_p = jax.nn.log_softmax(pred, axis=-1)
    onehot = jax.nn.one_hot(gt, pred.shape[-1], dtype=pred.dtype)
    ce = -jnp.sum(onehot * log_p, axis=-1)
    target_p = jnp.sum(jax.nn.softmax(pred, axis=-1) * onehot, axis=-1)
    return jnp.mean((1.0 - target_p) ** gamma * ce)


def projection_mask_loss(
    pm: Optional[tuple],
    intrinsic: jnp.ndarray,
    img_size: Tuple[int, int],
    decalib_q: jnp.ndarray,
    decalib_t: jnp.ndarray,
    focal: bool = True,
    focal_gamma: float = 2.0,
    sigmoid: bool = False,
) -> Optional[jnp.ndarray]:
    """Mask CE / focal / BCE loss (ref compute_loss.py:19-37 GetProjectionLoss).

    pm = (pred_logits (B,N,2|1), points (B,N,3)[, gt_onehot (B,N,2)]).
    """
    if pm is None:
        return None
    if len(pm) >= 3 and pm[2] is not None:
        l_gt = jnp.argmax(jax.lax.stop_gradient(pm[2]), axis=-1).astype(jnp.int32)
    else:
        l_gt = jax.lax.stop_gradient(
            get_projection_gt(pm[1], intrinsic, img_size, decalib_q, decalib_t)
        )
    pred = pm[0]
    if sigmoid:
        p = jnp.clip(pred.reshape(-1), 1e-7, 1 - 1e-7)
        y = l_gt.reshape(-1).astype(p.dtype)
        return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    pred2 = pred.reshape(-1, 2)
    gt1 = l_gt.reshape(-1)
    if focal:
        return focal_loss(pred2, gt1, focal_gamma)
    log_p = jax.nn.log_softmax(pred2, axis=-1)
    return -jnp.mean(jnp.take_along_axis(log_p, gt1[:, None], axis=-1))


def registration_loss(
    out3: jnp.ndarray,
    out4: jnp.ndarray,
    q_gt: jnp.ndarray,
    t_gt: jnp.ndarray,
    sx: jnp.ndarray,
    sq: jnp.ndarray,
    l1_trans: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-level pose loss with learned homoscedastic weights
    (ref compute_loss.py:102-133 Get_loss).

    out3/out4: (B, 7) [q, t]; returns (loss_sum, quat_loss, trans_loss).
    Level weighting follows the reference exactly: Get_loss names out3's
    terms l2_* and out4's terms l3_*, and sums 1.6 * l3 + 0.8 * l2 — i.e.
    1.6 on the COARSE (out4) level and 0.8 on the refined (out3) level
    (ref :127).
    """

    def level_loss(out):
        q_pred, t_pred = out[:, :4], out[:, 4:]
        loss_q = jnp.mean(
            jnp.sqrt(jnp.sum((q_gt - q_pred) ** 2, axis=-1) + 1e-10)
        )
        if l1_trans:
            loss_x = jnp.mean(jnp.abs(t_pred - t_gt))
        else:
            loss_x = jnp.mean(
                jnp.sqrt(jnp.sum((t_pred - t_gt) ** 2, axis=-1) + 1e-10)
            )
        return loss_q, loss_x

    sx = sx.reshape(())
    sq = sq.reshape(())
    l2_loss_q, l2_loss_x = level_loss(out3)  # ref: out3 -> l2_* (weight 0.8)
    l3_loss_q, l3_loss_x = level_loss(out4)  # ref: out4 -> l3_* (weight 1.6)
    l3 = l3_loss_x * jnp.exp(-sx) + sx + l3_loss_q * jnp.exp(-sq) + sq
    l2 = l2_loss_x * jnp.exp(-sx) + sx + l2_loss_q * jnp.exp(-sq) + sq
    loss_sum = 1.6 * l3 + 0.8 * l2
    real_loss = 1.6 * l3_loss_q + 0.8 * l2_loss_q
    dual_loss = 1.6 * l3_loss_x + 0.8 * l2_loss_x
    return loss_sum, real_loss, dual_loss


def pointwise_reprojection_loss(
    p: jnp.ndarray,
    intrinsic: jnp.ndarray,
    img_size: Tuple[int, int],
    out3: jnp.ndarray,
    out4: jnp.ndarray,
    decalib_q: jnp.ndarray,
    decalib_t: jnp.ndarray,
) -> jnp.ndarray:
    """Reprojection L1 over in-frustum points
    (ref compute_loss.py:66-99 GetPointwiseReProjectionLoss)."""
    p_projected = get_projection_gt(
        p, intrinsic, img_size, decalib_q, decalib_t
    ).astype(jnp.float32)
    K = intrinsic.astype(jnp.float32)

    def project(q, t):
        E = Q.pose_to_matrix(q, t)
        cam = jnp.einsum("bij,bnj->bni", E[:, :, :3], p,
                         precision=jax.lax.Precision.HIGHEST) + E[:, None, :, 3]
        uvw = jnp.einsum("bij,bnj->bni", K, cam,
                         precision=jax.lax.Precision.HIGHEST)
        return uvw[..., :2] / (uvw[..., 2:] + 1e-10)

    p_gt = project(decalib_q, decalib_t)
    p3 = project(out3[:, :4], out3[:, 4:])
    p4 = project(out4[:, :4], out4[:, 4:])
    denom = jnp.sum(p_projected) + 1e-10
    l3 = jnp.sum(jnp.sum(jnp.abs(p3 - p_gt), -1) * p_projected) / denom
    l4 = jnp.sum(jnp.sum(jnp.abs(p4 - p_gt), -1) * p_projected) / denom
    return 1.6 * l3 + 0.8 * l4


def rt_loss(
    gt_q: jnp.ndarray,
    gt_t: jnp.ndarray,
    R3: jnp.ndarray,
    t3: jnp.ndarray,
    R4: jnp.ndarray,
    t4: jnp.ndarray,
    sq: jnp.ndarray,
    sx: jnp.ndarray,
):
    """Rotation-matrix variant (ref compute_loss.py:158-173 Get_loss_Rt)."""
    gt_R = Q.quat_to_rotmat(gt_q)

    def one(Rp):
        err = jnp.einsum("bji,bjk->bik", gt_R, Rp,
                         precision=jax.lax.Precision.HIGHEST) - jnp.eye(3, dtype=Rp.dtype)
        return jnp.mean(jnp.sum(err**2, axis=(1, 2)))

    real = 1.6 * one(R4) + 0.8 * one(R3)
    dual = 1.6 * jnp.mean(jnp.abs(gt_t - t4)) + 0.8 * jnp.mean(jnp.abs(gt_t - t3))
    loss = jnp.exp(-sq) * real + sq + jnp.exp(-sx) * dual + sx
    return real, dual, loss
