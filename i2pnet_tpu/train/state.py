"""Train state and optimizer.

Reproduces the reference optimization recipe
(/root/reference/train20v2learn_wandb.py:202-209, :805-811):
Adam(lr=1e-3, weight_decay=1e-4 as coupled L2), ExponentialLR(0.99) stepped
per epoch, optional global-norm gradient clipping.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    lr_decay: float = 0.99,
    steps_per_epoch: int = 1,
    clip: float = -1.0,
) -> optax.GradientTransformation:
    """torch.optim.Adam + per-epoch ExponentialLR as one optax chain.

    torch Adam's weight_decay is coupled L2 (added to the gradient before the
    moment updates), i.e. optax.add_decayed_weights *before* adam — not AdamW.
    """
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=steps_per_epoch,
        decay_rate=lr_decay,
        staircase=True,
    )
    parts = []
    if clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(schedule))
    return optax.chain(*parts)


def create_train_state(
    model,
    variables,
    lr: float = 1e-3,
    weight_decay: float = 1e-4,
    lr_decay: float = 0.99,
    steps_per_epoch: int = 1,
    clip: float = -1.0,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    if tx is None:
        tx = make_optimizer(lr, weight_decay, lr_decay, steps_per_epoch, clip)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        tx=tx,
    )
