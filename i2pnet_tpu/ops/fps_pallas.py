"""Farthest point sampling as a single Pallas TPU kernel.

The XLA while-loop FPS (ops.pointops.farthest_point_sample) pays per-
iteration kernel overhead (~20 us x npoint); this kernel keeps the cloud,
the running distances and the farthest index in VMEM across all iterations
(measured ~10x faster at B=8, N=8192, npoint=2048 on v5e).

Semantics identical to the reference CUDA kernel (ref
pointnet2/src/sampling_gpu.cu:95-253): deterministic start at index 0,
argmax tie-break = lowest index.

Layout: coordinates as (3, B, N) so the batch rides the sublane dimension
and points ride lanes — every per-iteration op is a full-width VPU op; the
centroid gather is a one-hot reduction (no scalar loads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(npoint: int, xyz_ref, idx_ref, dist_ref, far_ref):
    B, N = dist_ref.shape
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (B, npoint), 1)

    # init
    dist_ref[:] = jnp.full((B, N), jnp.inf, dtype=jnp.float32)
    far_ref[:] = jnp.zeros((B, 1), dtype=jnp.int32)
    idx_ref[:] = jnp.zeros((B, npoint), dtype=jnp.int32)

    def body(i, _):
        far = far_ref[:]  # (B, 1)
        # dynamic-offset lane stores don't lower on Mosaic; write the i-th
        # output slot via a one-hot accumulate (full-width, static shape)
        slot = (out_iota == i).astype(jnp.int32)
        idx_ref[:] = idx_ref[:] + far * slot

        onehot = (lane_iota == far).astype(jnp.float32)  # (B, N)
        cx = jnp.sum(xyz_ref[0] * onehot, axis=-1, keepdims=True)
        cy = jnp.sum(xyz_ref[1] * onehot, axis=-1, keepdims=True)
        cz = jnp.sum(xyz_ref[2] * onehot, axis=-1, keepdims=True)

        dx = xyz_ref[0] - cx
        dy = xyz_ref[1] - cy
        dz = xyz_ref[2] - cz
        d = dx * dx + dy * dy + dz * dz

        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist
        far_ref[:] = jnp.argmax(dist, axis=-1, keepdims=True).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, npoint, body, 0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fps_pallas(xyz: jnp.ndarray, npoint: int, interpret: bool = False) -> jnp.ndarray:
    """xyz: (B, N, 3) -> (B, npoint) int32 indices."""
    B, N, _ = xyz.shape
    xyz_t = jnp.transpose(xyz, (2, 0, 1)).astype(jnp.float32)  # (3, B, N)
    kernel = functools.partial(_fps_kernel, npoint)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, npoint), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, N), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(xyz_t)
