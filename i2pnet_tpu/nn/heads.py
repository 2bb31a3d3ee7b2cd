"""Prediction heads (ref /root/reference/src/modules/MainModules.py).

FlowPredictor (:10-46), PoseHead (:246-383), ProjectMask (:386-420),
DelayWeight (:423-449, here a pure function of the step counter so it stays
functional under jit).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from i2pnet_tpu.nn.layers import PointwiseConv, PointwiseMLP


class FlowPredictor(nn.Module):
    """Concat -> pointwise MLP (ref MainModules.py:10-46)."""

    mlp: Sequence[int]
    dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(
        self,
        points_f1: jnp.ndarray,
        upsampled_feat: Optional[jnp.ndarray],
        cost_volume: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        if upsampled_feat is not None:
            x = jnp.concatenate([points_f1, cost_volume, upsampled_feat], axis=-1)
        else:
            x = jnp.concatenate([points_f1, cost_volume], axis=-1)
        return PointwiseMLP(self.mlp, use_bn=True, dtype=self.dtype, name="mlp_conv")(x, train)


class PoseHead(nn.Module):
    """Masked softmax pooling -> hidden -> (q, t) heads (ref :246-383).

    q is L2-normalized (ref :381). Dropout rate 0.5 on the pooled embedding.
    """

    mlp1: Sequence[int]
    mlp2: Sequence[int]
    hidden: int
    q_dim: int = 4
    t_dim: int = 3
    dropout_rate: float = 0.5
    split_dp: bool = False
    corr_func: str = "concat"  # | diff | normalized_diff
    pos_embed: bool = False
    sigmoid: bool = False
    maxhead: bool = False

    @nn.compact
    def __call__(
        self,
        prediction: jnp.ndarray,
        mask: jnp.ndarray,
        xyz: jnp.ndarray,
        feature: jnp.ndarray,
        projection_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B, N, _ = prediction.shape

        if not self.sigmoid:
            if projection_mask is not None:
                pm = jnp.argmax(jax.lax.stop_gradient(projection_mask), axis=-1)
                pm = pm[..., None].astype(mask.dtype)
                mask = mask * pm + -1e10 * (1.0 - pm)
        else:
            prediction = prediction * projection_mask

        if self.maxhead:
            mask = jnp.max(mask, axis=-1, keepdims=True)
        mask_p = jax.nn.softmax(mask, axis=1)
        global_prediction = jnp.sum(prediction * mask_p, axis=1, keepdims=True)

        if len(self.mlp1) > 0:
            global_ext = jnp.broadcast_to(
                global_prediction, (B, N, global_prediction.shape[-1])
            )
            if self.pos_embed:
                center_xyz = xyz - jnp.mean(xyz, axis=1, keepdims=True)
                pos_info = jnp.concatenate([xyz, center_xyz], axis=-1)
                # embeds to the prediction width (ref :268 pos_encoder)
                pos_embedding = PointwiseConv(
                    prediction.shape[-1], use_bn=True, name="pos_encoder"
                )(pos_info, train)

            if self.corr_func == "concat":
                g = jnp.concatenate([prediction, global_ext], axis=-1)
            elif self.corr_func == "diff":
                g = prediction - global_prediction
            elif self.corr_func == "normalized_diff":
                def norm(x):
                    m = jnp.mean(x, axis=-1, keepdims=True)
                    s = jnp.std(x, axis=-1, keepdims=True, ddof=1)
                    return (x - m) / (s + 1e-10)

                g = norm(prediction) * norm(global_prediction)
            else:
                raise NotImplementedError(self.corr_func)
            if self.pos_embed:
                g = jnp.concatenate([g, pos_embedding], axis=-1)
            g = PointwiseMLP(self.mlp1, use_bn=True, name="mlps")(g, train)

            if len(self.mlp2) > 0:
                ge = jnp.concatenate([g, mask, feature], axis=-1)
                ge = PointwiseMLP(self.mlp2, use_bn=True, name="mlp2s")(ge, train)
            else:
                ge = g
            weight = jax.nn.softmax(ge, axis=1)
            result = jnp.sum(weight * prediction, axis=1, keepdims=True)
        else:
            result = global_prediction

        # hidden/quat/trans heads: plain Dense, no activation (ref :299-301)
        hidden_feature = nn.Dense(self.hidden, name="hidden_layer")(result)
        dp = lambda x, name: nn.Dropout(self.dropout_rate, name=name)(
            x, deterministic=not train
        )
        if self.split_dp:
            h1 = hidden_feature
        else:
            h1 = dp(hidden_feature, "dp1")
        if self.split_dp:
            h2q = dp(h1, "dp2q")
            h2t = dp(h1, "dp2t")
        else:
            h2q = h2t = h1
        q = nn.Dense(self.q_dim, name="quat_head")(h2q)[:, 0, :]
        t = nn.Dense(self.t_dim, name="trans_head")(h2t)[:, 0, :]
        q = q / (jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-10) + 1e-10)
        return q, t, mask_p


class ProjectMask(nn.Module):
    """Outlier-mask classifier head (ref :386-420)."""

    mlp: Sequence[int]
    sigmoid: bool = False
    drop: float = 0.0

    @nn.compact
    def __call__(
        self,
        feature: Optional[jnp.ndarray],
        prediction: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        x = (
            jnp.concatenate([feature, prediction], axis=-1)
            if feature is not None
            else prediction
        )
        for i, f in enumerate(self.mlp):
            x = PointwiseConv(f, use_bn=True, name=f"mlp_{i}")(x, train)
            if self.drop > 0:
                x = nn.Dropout(self.drop)(x, deterministic=not train)
        out = nn.Dense(1 if self.sigmoid else 2, name="out")(x)
        if self.sigmoid:
            out = jax.nn.sigmoid(out)
        return out


def delay_weight(
    gt: Optional[jnp.ndarray],
    pred: Optional[jnp.ndarray],
    now_step: jnp.ndarray,
    delay_step: int,
    ab_delay: bool = False,
) -> jnp.ndarray:
    """gt -> pred annealing for projection masks (ref :423-449 DelayWeight).

    now_step counts DOWN from delay_step to 0 (the caller owns the counter —
    functionally, it's `max(delay_step - global_step, 0)`).
    """
    if gt is None:
        return pred
    if pred is None:
        return gt
    if ab_delay:
        return jnp.where(now_step > 0, gt, pred)
    pred = jax.nn.softmax(pred, axis=-1)
    w = now_step.astype(pred.dtype) / (delay_step + 1e-10)
    return gt * w + pred * (1.0 - w)
