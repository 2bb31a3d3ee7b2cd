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
from i2pnet_tpu.losses import (
    get_projection_gt,
    projection_mask_loss,
    registration_loss,
)


def _compute_gt_project(batch, hw):
    """On-device in-frustum labels as one-hot (B, N, 2), the array the
    reference builds in its train/validate loops when the gt-mask flags are
    set (ref train20v2learn_wandb.py:732-736 / :356-360: get_projection_gt
    + F.one_hot(num_classes=2)). Computed inside the jitted step — no extra
    host round-trip."""
    labels = get_projection_gt(
        batch["lidar"],
        batch["intrinsic"],
        tuple(hw),
        batch["decalib_q_gt"],
        batch["decalib_t_gt"],
    )
    return jax.nn.one_hot(labels, 2, dtype=jnp.float32)


def _delay_now_step(cfg, step):
    """DelayWeight counter for a given optimizer step, or None to use the
    model's frozen default.

    The reference decrements a buffer once per training forward when
    mask_delay (or unconditionally on the ab_delay branch) is set
    (ref src/modules/MainModules.py:431-449); one optimizer step == one
    forward there, so the counter is a pure function of the global step:
    max(delay_step - step, 0). With both flags off the reference counter
    never moves (weight stays 1.0 -> pure gt masks), which the model's
    default now_step reproduces.
    """
    if not (cfg.mask_delay or cfg.ab_delay):
        return None
    return jnp.maximum(
        jnp.float32(cfg.mask_delay_step) - step.astype(jnp.float32), 0.0
    )


def _free_point_loss_fn(model, cfg: I2PNetConfig, img_size=None,
                        train_target: str = "all"):
    """loss(params, batch_stats, batch, rng, step) for the free-point model.

    train_target selects the loss composition exactly like the reference's
    --train_target flag (ref train20v2learn_wandb.py:756-793):
      'all'    -> registration + 1.5 * mask loss
      'regist' -> registration only (mask loss still computed for logging)
      'class'  -> mask loss only
    """
    if train_target not in ("all", "regist", "class"):
        raise ValueError(f"train_target must be all|regist|class, got {train_target}")

    def loss_fn(params, batch_stats, batch, rng, step):
        hw_ = img_size or batch["rgb"].shape[1:3]
        gt_project = batch.get("gt_project")
        if gt_project is None and cfg.ground_truth_projection_mask:
            # the reference computes gt_project in-loop when the flag is
            # set (ref train20v2learn_wandb.py:732-736); here it lives on
            # device inside the jitted step
            gt_project = _compute_gt_project(batch, hw_)
        out, new_model_state = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["rgb"],
            batch["lidar"],
            batch["intrinsic"],
            lidar_feature=batch.get("lidar_feats"),
            raw_xyz=batch.get("raw_xyz"),
            gt_project=gt_project,
            now_step=_delay_now_step(cfg, step),
            calib=batch.get("calib"),
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        reg_loss, loss_q, loss_x = registration_loss(
            out["out3"],
            out["out4"],
            batch["decalib_q_gt"],
            batch["decalib_t_gt"],
            out["sx"],
            out["sq"],
            l1_trans=cfg.l1_trans_loss,
        )
        hw = hw_
        pls = [
            projection_mask_loss(
                pm,
                batch["intrinsic"],
                hw,
                batch["decalib_q_gt"],
                batch["decalib_t_gt"],
                focal=cfg.focal_mask_loss,
                focal_gamma=cfg.focal_gamma,
                sigmoid=cfg.mask_sigmoid,
            )
            for pm in (out["pm3"], out["pm4"])
        ]
        pl3, pl4 = pls
        if pl3 is not None and pl4 is not None:
            # level weights 1.6 (coarse/l4) + 0.8 (refined/l3), matching
            # Get_loss's orientation (ref train20v2learn_wandb.py:766-770)
            mask_loss = 1.6 * pl4 + 0.8 * pl3
        else:
            mask_loss = pl4 if pl3 is None else pl3
        if train_target == "class":
            if mask_loss is None:
                raise ValueError("train_target='class' needs mask heads enabled")
            loss = mask_loss
        else:
            loss = reg_loss
            if mask_loss is not None and train_target == "all":
                # mask loss weight 1.5 (ref train20v2learn_wandb.py:784-791)
                loss = loss + 1.5 * mask_loss
        metrics = {
            "loss": loss,
            "loss_q": loss_q,
            "loss_x": loss_x,
            "loss_mask": (mask_loss if mask_loss is not None
                          else jnp.zeros_like(loss)),
            "sx": out["sx"].reshape(()),
            "sq": out["sq"].reshape(()),
        }
        return loss, (new_model_state, metrics)

    return loss_fn


def _proj_loss_fn(model, cfg):
    """loss(params, batch_stats, batch, rng) for the projection-aware model.

    Masks are not used in the proj path (ref train20v2learn_wandb_proj.py
    drops the mask branches); batch additionally requires raw_xyz (B,N,3).
    """

    def loss_fn(params, batch_stats, batch, rng, step):
        del step  # proj path has no mask/DelayWeight branch
        out, new_model_state = model.apply(
            {"params": params, "batch_stats": batch_stats},
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

    return loss_fn


def _make_plain_step(loss_fn):
    def train_step(state, batch, rng):
        grads, (new_model_state, metrics) = jax.grad(
            functools.partial(loss_fn, batch_stats=state.batch_stats,
                              batch=batch, rng=rng, step=state.step),
            has_aux=True,
        )(state.params)
        state = state.apply_gradients(
            grads=grads, batch_stats=new_model_state["batch_stats"]
        )
        return state, metrics

    return train_step


def make_train_step(model, cfg: I2PNetConfig, img_size: Optional[Tuple[int, int]] = None,
                    train_target: str = "all"):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict with rgb (B,H,W,3), lidar (B,N,3), intrinsic (B,3,3),
    decalib_q_gt (B,4), decalib_t_gt (B,3); optional lidar_feats (B,N,3),
    raw_xyz (B,N,3), gt_project (B,N).
    """
    return _make_plain_step(_free_point_loss_fn(model, cfg, img_size, train_target))


def make_train_step_proj(model, cfg):
    """Train step for the projection-aware model (I2PNetProj)."""
    return _make_plain_step(_proj_loss_fn(model, cfg))


def make_accum_train_step(
    model,
    cfg,
    accum_steps: int,
    proj: bool = False,
    img_size: Optional[Tuple[int, int]] = None,
    train_target: str = "all",
):
    """Gradient-accumulation train step: one optimizer update per call,
    built from `accum_steps` sequential microbatch grads via lax.scan.

    The batch's leading axis B must be divisible by accum_steps; each
    microbatch has B // accum_steps samples. Grads are averaged across
    microbatches (same scale as a plain step on the full batch); BN batch
    stats update sequentially per microbatch, matching torch-style grad
    accumulation (each microbatch normalizes with its own statistics).
    The reference has no equivalent — it is capped at what one GPU's
    memory fits (ref train20v2learn_wandb.py:702); on TPU the scan keeps
    the working set at microbatch size so effective batch is unbounded.

    accum_steps=1 is bit-identical to the plain step. Metrics are averaged
    over microbatches.
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")
    loss_fn = (_proj_loss_fn if proj else
               functools.partial(_free_point_loss_fn, img_size=img_size,
                                 train_target=train_target))(model, cfg)

    def train_step(state, batch, rng):
        B = batch["rgb"].shape[0]
        if B % accum_steps != 0:
            raise ValueError(f"batch size {B} not divisible by accum_steps {accum_steps}")
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum_steps, B // accum_steps) + x.shape[1:]),
            batch,
        )
        # accum_steps=1 keeps the caller's key unsplit so the dropout draw
        # is bit-identical to the plain step
        rngs = (
            jnp.stack([rng])
            if accum_steps == 1
            else jax.random.split(rng, accum_steps)
        )

        def body(carry, xs):
            batch_stats, grad_acc = carry
            mb, r = xs
            grads, (new_model_state, metrics) = jax.grad(
                loss_fn, has_aux=True
            )(state.params, batch_stats, mb, r, state.step)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            return (new_model_state["batch_stats"], grad_acc), metrics

        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (batch_stats, grad_sum), metrics = jax.lax.scan(
            body, (state.batch_stats, zero), (micro, rngs)
        )
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grad_sum)
        state = state.apply_gradients(grads=grads, batch_stats=batch_stats)
        metrics = jax.tree_util.tree_map(lambda m: m.mean(0), metrics)
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
    """Returns eval_step(state, batch) -> out dict (pose predictions).

    Validation forwards gt_project and the live DelayWeight counter like
    the reference's validate() (ref train20v2learn_wandb.py:373-396 passes
    gt_project and the model's decremented buffer), so gt-mask /
    mask_delay configs are evaluated with the same mask mixture they
    train with. When cfg.ground_truth_projection_mask_eval is set and the
    batch carries no gt_project, the labels are computed on device exactly
    as the reference's validate() does (ref :356-360).
    """

    def eval_step(state, batch):
        gt_project = batch.get("gt_project")
        if gt_project is None and cfg.ground_truth_projection_mask_eval:
            gt_project = _compute_gt_project(batch, batch["rgb"].shape[1:3])
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["rgb"],
            batch["lidar"],
            batch["intrinsic"],
            lidar_feature=batch.get("lidar_feats"),
            raw_xyz=batch.get("raw_xyz"),
            gt_project=gt_project,
            now_step=_delay_now_step(cfg, state.step),
            calib=batch.get("calib"),
            train=False,
        )

    return eval_step
