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

    Calls run under ``jax.set_mesh(mesh)`` so the mesh is ambient at trace
    time: the fused Pallas encoder detects the pure-DP axis and rides it
    per-shard via shard_map (nn/layers.py _ambient_dp_axis) instead of
    falling back to the native encoder.
    """
    repl = replicate_spec(mesh)
    data = batch_spec(mesh, axis_name)
    jitted = jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    def call(state, batch, rng):
        with jax.set_mesh(mesh):
            return jitted(state, batch, rng)

    def lower(*args, **kwargs):
        with jax.set_mesh(mesh):
            return jitted.lower(*args, **kwargs)

    call.jitted = jitted
    call.lower = lower
    return call


# ---------------------------------------------------------------------------
# Hybrid data x spatial parallelism (dp x sp)
#
# Why SP and not tp/pp/ep: the models are <10M params (replicating them costs
# ~40 MB/chip), the widest MLP channel is 512 (tensor-sharding a 512-wide 1x1
# conv trades one HBM pass for per-layer all-reduces — a loss at this size),
# there are no experts (ep n/a) and only ~6 coarse stages (pp would idle most
# of a pipeline). The measured bottleneck is HBM traffic through the
# full-resolution RGB encoder stage (BASELINE.md round-2: 107 of 120 ms of
# the free-point backward, 80 GB accessed). Sharding the image W axis splits
# exactly that traffic: XLA/GSPMD partitions the 3x3 convs and pools with
# halo exchanges over ICI (the halo is 1 column per conv — ~KB-scale
# transfers vs the MB-scale activation traffic saved). SP therefore extends
# scaling past the batch-per-chip=1 wall of pure DP: on a mesh with more
# chips than the global batch, the leftover axis shards W instead of idling.
#
# The LiDAR/point tensors stay data-sharded only (the point pyramid's
# gathers are irregular across N; sharding N would turn every FPS/KNN into
# cross-chip all-to-alls — SURVEY.md §5.7: replicate image features, shard
# points is the *only* exchange-friendly split, and points already ride the
# batch axis here). GSPMD guarantees identical numerics up to reduction
# order; tests/test_spatial_parallel.py asserts dp x sp gradients match the
# plain single-device step on the same batch (model configs must set
# spatial_parallel=True — see max_pool_3x3's stride-1 GSPMD workaround).
# ---------------------------------------------------------------------------


def make_mesh_2d(
    n_data: int,
    n_space: int,
    devices: Optional[Sequence] = None,
    axis_names: tuple = ("data", "space"),
) -> Mesh:
    """A (data, space) mesh for hybrid batch x image-width sharding."""
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_space
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_space), axis_names)


def spatial_batch_specs(mesh: Mesh, batch: dict) -> dict:
    """Per-leaf shardings: rgb (B,H,W,3) sharded (data, -, space, -); every
    other leaf sharded on batch only. W is the sharded image axis because it
    survives the /32 pyramid widest (1280 -> 40 at l3 vs 384 -> 12 for H)."""
    data = NamedSharding(mesh, P("data"))
    rgb = NamedSharding(mesh, P("data", None, "space", None))
    return {k: (rgb if k == "rgb" else data) for k in batch}


def shard_train_step_spatial(train_step, mesh: Mesh, batch: dict):
    """jit a train_step over a (data, space) mesh: state replicated, batch
    data-sharded with rgb additionally W-sharded across 'space'. XLA inserts
    conv/pool halo exchanges inside the RGB encoder and an all-gather where
    the flattened image features meet the replicated-in-space point branch.
    `batch` supplies the key set for the per-leaf specs."""
    repl = replicate_spec(mesh)
    jitted = jax.jit(
        train_step,
        in_shardings=(repl, spatial_batch_specs(mesh, batch), repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    def call(state, batch_, rng):
        # ambient mesh for trace-time introspection; the 'space' axis keeps
        # the fused Pallas paths off (nn/layers.py _ambient_dp_axis)
        with jax.set_mesh(mesh):
            return jitted(state, batch_, rng)

    call.jitted = jitted
    return call


def shard_batch_spatial(mesh: Mesh, batch: dict) -> dict:
    specs = spatial_batch_specs(mesh, batch)
    return {k: jax.device_put(v, specs[k]) for k, v in batch.items()}
