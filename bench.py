"""Benchmark: image-LiDAR registration pairs/sec/chip on TPU.

Runs the flagship forward (free-point I2PNet, shipped config, KITTI
small-range shapes: batch 8, N=8192 points, 384x1280 image — matching the
reference eval protocol batch size, ref evaluation_proj.py:239-264) and
prints ONE JSON line.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator below is the driver north star's reference-GPU estimate used
as the 5x-target base. It is replaced by a measured number once one exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Estimated reference single-GPU pairs/sec (batch 8 eval protocol). No
# published value exists in-repo (BASELINE.md); documented assumption.
REFERENCE_PAIRS_PER_SEC = 40.0

BATCH = 8
IMG_H, IMG_W = 384, 1280


def main():
    import dataclasses

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet

    # production inference config: bf16 conv/dense compute (outputs match
    # f32 to ~3e-3; f32: 164 pairs/s, bf16: 241 pairs/s on v5e)
    cfg = dataclasses.replace(I2PNetConfig(), compute_dtype="bfloat16")
    model = I2PNet(cfg)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(BATCH, IMG_H, IMG_W, 3)).astype(np.float32))
    lidar = jnp.asarray(
        rng.uniform(-10, 10, size=(BATCH, cfg.lidar_in_points, 3)).astype(np.float32)
    )
    lidar = lidar.at[..., 2].add(20.0)
    intrinsic = jnp.tile(
        jnp.asarray(
            [[[718.0, 0, IMG_W / 2], [0, 718.0, IMG_H / 2], [0, 0, 1]]],
            dtype=jnp.float32,
        ),
        (BATCH, 1, 1),
    )

    variables = model.init(jax.random.key(0), rgb, lidar, intrinsic, train=False)

    @jax.jit
    def forward(variables, rgb, lidar, intrinsic):
        out = model.apply(variables, rgb, lidar, intrinsic, train=False)
        return out["out3"], out["out4"]

    # NOTE: jax.block_until_ready does NOT actually block on the axon
    # tunnel; force completion by pulling a scalar to the host (FIFO queue
    # means one pull fences all queued work).
    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))

    # warmup / compile
    out = forward(variables, rgb, lidar, intrinsic)
    sync(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, rgb, lidar, intrinsic)
    sync(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * iters / dt
    print(
        json.dumps(
            {
                "metric": "image_lidar_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
