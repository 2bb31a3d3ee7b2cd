"""Jitted train / eval steps.

One fused XLA step: forward + loss + backward + optimizer + BN-stat update,
all on device (the reference's loop, ref train20v2learn_wandb.py:702-850,
does per-batch H2D/D2H and CPU metric pulls — deliberately not reproduced).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from i2pnet_tpu.config import I2PNetConfig
from i2pnet_tpu.losses import projection_mask_loss, registration_loss


def make_train_step(model, cfg: I2PNetConfig, img_size: Optional[Tuple[int, int]] = None):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict with rgb (B,H,W,3), lidar (B,N,3), intrinsic (B,3,3),
    decalib_q_gt (B,4), decalib_t_gt (B,3); optional lidar_feats (B,N,3),
    raw_xyz (B,N,3), gt_project (B,N).
    """

    def train_step(state, batch, rng):
        def loss_fn(params):
            out, new_model_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["rgb"],
                batch["lidar"],
                batch["intrinsic"],
                lidar_feature=batch.get("lidar_feats"),
                raw_xyz=batch.get("raw_xyz"),
                gt_project=batch.get("gt_project"),
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss, loss_q, loss_x = registration_loss(
                out["out3"],
                out["out4"],
                batch["decalib_q_gt"],
                batch["decalib_t_gt"],
                out["sx"],
                out["sq"],
                l1_trans=cfg.l1_trans_loss,
            )
            hw = img_size or batch["rgb"].shape[1:3]
            for pm in (out["pm3"], out["pm4"]):
                pl = projection_mask_loss(
                    pm,
                    batch["intrinsic"],
                    hw,
                    batch["decalib_q_gt"],
                    batch["decalib_t_gt"],
                    focal=cfg.focal_mask_loss,
                    focal_gamma=cfg.focal_gamma,
                    sigmoid=cfg.mask_sigmoid,
                )
                if pl is not None:
                    # mask loss weight 1.5 (ref train20v2learn_wandb.py:784-791)
                    loss = loss + 1.5 * pl
            metrics = {
                "loss": loss,
                "loss_q": loss_q,
                "loss_x": loss_x,
                "sx": out["sx"].reshape(()),
                "sq": out["sq"].reshape(()),
            }
            return loss, (new_model_state, metrics)

        grads, (new_model_state, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(
            grads=grads, batch_stats=new_model_state["batch_stats"]
        )
        return state, metrics

    return train_step


def make_train_step_proj(model, cfg):
    """Train step for the projection-aware model (I2PNetProj).

    batch additionally requires raw_xyz (B,N,3); masks are not used in the
    proj path (ref train20v2learn_wandb_proj.py drops the mask branches).
    """

    def train_step(state, batch, rng):
        def loss_fn(params):
            out, new_model_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["rgb"],
                batch["lidar"],
                batch["raw_xyz"],
                batch["intrinsic"],
                lidar_feature=batch.get("lidar_feats"),
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss, loss_q, loss_x = registration_loss(
                out["out3"],
                out["out4"],
                batch["decalib_q_gt"],
                batch["decalib_t_gt"],
                out["sx"],
                out["sq"],
                l1_trans=cfg.l1_trans_loss,
            )
            metrics = {
                "loss": loss,
                "loss_q": loss_q,
                "loss_x": loss_x,
                "sx": out["sx"].reshape(()),
                "sq": out["sq"].reshape(()),
            }
            return loss, (new_model_state, metrics)

        grads, (new_model_state, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(
            grads=grads, batch_stats=new_model_state["batch_stats"]
        )
        return state, metrics

    return train_step


def make_eval_step_proj(model, cfg):
    def eval_step(state, batch):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["rgb"],
            batch["lidar"],
            batch["raw_xyz"],
            batch["intrinsic"],
            lidar_feature=batch.get("lidar_feats"),
            train=False,
        )

    return eval_step


def make_eval_step(model, cfg: I2PNetConfig):
    """Returns eval_step(state, batch) -> out dict (pose predictions)."""

    def eval_step(state, batch):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["rgb"],
            batch["lidar"],
            batch["intrinsic"],
            lidar_feature=batch.get("lidar_feats"),
            raw_xyz=batch.get("raw_xyz"),
            train=False,
        )

    return eval_step
