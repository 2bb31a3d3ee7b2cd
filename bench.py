"""Benchmark: image-LiDAR registration pairs/sec/chip on TPU.

Headline metric: flagship forward (free-point I2PNet, shipped config, KITTI
small-range shapes: batch 8, N=8192 points, 384x1280 image — matching the
reference eval protocol batch size, ref evaluation_proj.py:239-264).

The same JSON line additionally carries the other two hot paths so
regressions in any of them show in BENCH_r*.json:
  * proj_fwd_pairs_per_sec  — projection model forward (150k pts, 64x1800
    spherical grid, ref evaluation_proj.py protocol shapes)
  * train_pairs_per_sec     — free-point fused train step (fwd+bwd+Adam)

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator below is the driver north star's reference-GPU estimate used
as the 5x-target base. It is replaced by a measured number once one exists.
"""

from __future__ import annotations

import dataclasses
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


def sync(x):
    # NOTE: jax.block_until_ready does NOT actually block on the axon
    # tunnel; force completion by pulling a scalar to the host (FIFO queue
    # means one pull fences all queued work).
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def time_fn(fn, args, iters):
    out = fn(*args)  # warmup / compile
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return time.perf_counter() - t0


def bench_free_point_forward():
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

    iters = 20
    dt = time_fn(forward, (variables, rgb, lidar, intrinsic), iters)
    fwd_pairs = BATCH * iters / dt

    # fused train step on the same shapes (fwd + loss + bwd + Adam)
    from i2pnet_tpu.train import create_train_state, make_train_step

    batch = {
        "rgb": rgb, "lidar": lidar, "intrinsic": intrinsic,
        "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (BATCH, 1)),
        "decalib_t_gt": jnp.zeros((BATCH, 3)),
    }
    state = create_train_state(model, variables, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    state, m = step(state, batch, jax.random.key(0))  # warmup / compile
    sync(m["loss"])
    # 20 iters: 10-iteration windows showed ~10% host-dispatch noise
    # (BASELINE.md round-3 methodology note)
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.key(i))
    sync(m["loss"])
    train_pairs = BATCH * iters / (time.perf_counter() - t0)
    return fwd_pairs, train_pairs


def bench_proj_forward():
    from i2pnet_tpu.config import I2PNetProjConfig
    from i2pnet_tpu.models import I2PNetProj
    from i2pnet_tpu.ops import quaternion as Q

    cfg = I2PNetProjConfig()
    model = I2PNetProj(cfg)
    rng = np.random.default_rng(0)
    N = 150000
    raw_np = rng.normal(size=(BATCH, N, 3)).astype(np.float32) * 15
    raw_np[:, 120000:] = 0.0  # zero-pad tail, as the loader emits
    raw = jnp.asarray(raw_np)
    q = jnp.asarray([[0.999, 0.0, 0.04, 0.0]] * BATCH, jnp.float32)
    lidar = Q.warp_points(raw, q, jnp.asarray([[1.0, 0, 2.0]] * BATCH)) * (
        jnp.sum(raw**2, -1, keepdims=True) > 0
    )
    rgb = jnp.asarray(rng.normal(size=(BATCH, 160, 512, 3)).astype(np.float32))
    intr = jnp.tile(
        jnp.asarray([[[350.0, 0, 256], [0, 350.0, 80], [0, 0, 1]]], jnp.float32),
        (BATCH, 1, 1),
    )
    variables = model.init(jax.random.key(0), rgb, lidar, raw, intr, train=False)
    fwd = jax.jit(
        lambda v, r, l, w, i: model.apply(v, r, l, w, i, train=False)["out3"]
    )
    iters = 20  # >= 20 iters per the round-3 timing rule (CLAUDE.md)
    dt = time_fn(fwd, (variables, rgb, lidar, raw, intr), iters)
    fwd_pairs = BATCH * iters / dt

    # proj train step (fwd+bwd+Adam) — the path large-range training runs
    # (ref train20v2learn_wandb_proj.py); in the JSON so regressions show
    from i2pnet_tpu.train import create_train_state, make_train_step_proj

    batch = {
        "rgb": rgb, "lidar": lidar, "raw_xyz": raw, "intrinsic": intr,
        "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (BATCH, 1)),
        "decalib_t_gt": jnp.zeros((BATCH, 3)),
    }
    state = create_train_state(model, variables, steps_per_epoch=100)
    step = jax.jit(make_train_step_proj(model, cfg), donate_argnums=(0,))
    state, m = step(state, batch, jax.random.key(0))  # warmup / compile
    sync(m["loss"])
    iters = 20  # see free-point train comment
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.key(i))
    sync(m["loss"])
    train_pairs = BATCH * iters / (time.perf_counter() - t0)
    return fwd_pairs, train_pairs


def main():
    fwd_pairs, train_pairs = bench_free_point_forward()
    proj_pairs, proj_train_pairs = bench_proj_forward()
    print(
        json.dumps(
            {
                "metric": "image_lidar_pairs_per_sec_per_chip",
                "value": round(fwd_pairs, 2),
                "unit": "pairs/s",
                "vs_baseline": round(fwd_pairs / REFERENCE_PAIRS_PER_SEC, 3),
                "proj_fwd_pairs_per_sec": round(proj_pairs, 2),
                "train_pairs_per_sec": round(train_pairs, 2),
                "proj_train_pairs_per_sec": round(proj_train_pairs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
