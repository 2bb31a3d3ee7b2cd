"""Device-mesh data parallelism.

The reference is single-GPU (SURVEY.md §2.9: zero distributed machinery);
here scaling is TPU-native: a 1-D 'data' mesh, parameters replicated, batch
sharded on axis 0, XLA inserts the gradient/BN psums over ICI automatically
under jit with NamedSharding constraints. The model is <10M params, so pure
DP with replicated params is the right layout (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch: dict, axis_name: str = "data") -> dict:
    """Place a host batch onto the mesh, sharded along axis 0."""
    spec = batch_spec(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec), batch
    )


def shard_train_step(train_step, mesh: Mesh, axis_name: str = "data"):
    """jit a train_step(state, batch, rng) with DP shardings.

    State (params, opt state, BN stats) replicated; batch sharded along its
    leading axis; outputs (state, metrics) replicated. XLA turns the batch
    reductions inside grad/BN into psums over ICI.
    """
    repl = replicate_spec(mesh)
    data = batch_spec(mesh, axis_name)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
