#!/usr/bin/env python
"""Per-component TPU profiling with forced-completion timing.

jax.block_until_ready does NOT block over this box's TPU transport; this
tool times jitted callables by pulling a scalar (FIFO queue = full fence).

Usage: python tools/profile_tpu.py [--proj] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(name, fn, *args, iters=10):
    t_compile = time.perf_counter()
    out = fn(*args)
    sync(out)
    compile_s = time.perf_counter() - t_compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {ms:8.2f} ms/iter (first call {compile_s:.1f} s)", flush=True)
    return ms


def timeit_step(name, step, state, batch, iters=5):
    """Time a donated train step by threading the new state through."""
    import jax

    t_compile = time.perf_counter()
    state, m = step(state, batch, jax.random.key(0))
    sync(m["loss"])
    compile_s = time.perf_counter() - t_compile
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.key(i))
    sync(m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {ms:8.2f} ms/iter (first call {compile_s:.1f} s)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proj", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from i2pnet_tpu.config import I2PNetConfig, I2PNetProjConfig
    from i2pnet_tpu.models import I2PNet, I2PNetProj
    from i2pnet_tpu.ops import quaternion as Q
    from i2pnet_tpu.train import (
        create_train_state,
        make_train_step,
        make_train_step_proj,
    )

    rng = np.random.default_rng(0)
    B = args.batch
    if args.proj:
        cfg = I2PNetProjConfig()
        model = I2PNetProj(cfg)
        N = 150000
        raw_np = rng.normal(size=(B, N, 3)).astype(np.float32) * 15
        raw_np[:, 120000:] = 0.0
        raw = jnp.asarray(raw_np)
        q = jnp.asarray([[0.999, 0.0, 0.04, 0.0]] * B, jnp.float32)
        lidar = Q.warp_points(raw, q, jnp.asarray([[1.0, 0, 2.0]] * B)) * (
            jnp.sum(raw**2, -1, keepdims=True) > 0
        )
        rgb = jnp.asarray(rng.normal(size=(B, 160, 512, 3)).astype(np.float32))
        intr = jnp.tile(
            jnp.asarray([[[350.0, 0, 256], [0, 350.0, 80], [0, 0, 1]]], jnp.float32),
            (B, 1, 1),
        )
        variables = model.init(jax.random.key(0), rgb, lidar, raw, intr, train=False)
        fwd = jax.jit(
            lambda v, r, l, w, i: model.apply(v, r, l, w, i, train=False)["out3"]
        )
        timeit("proj forward", fwd, variables, rgb, lidar, raw, intr)
        batch = {
            "rgb": rgb, "lidar": lidar, "raw_xyz": raw, "intrinsic": intr,
            "decalib_q_gt": q, "decalib_t_gt": jnp.zeros((B, 3)),
        }
        state = create_train_state(model, variables, steps_per_epoch=100)
        step = jax.jit(make_train_step_proj(model, cfg), donate_argnums=(0,))
        timeit_step("proj train step", step, state, batch)
    else:
        import dataclasses

        cfg = dataclasses.replace(I2PNetConfig(), compute_dtype="bfloat16")
        model = I2PNet(cfg)
        rgb = jnp.asarray(rng.normal(size=(B, 384, 1280, 3)).astype(np.float32))
        lidar = jnp.asarray(
            rng.uniform(-10, 10, size=(B, cfg.lidar_in_points, 3)).astype(np.float32)
        ) + jnp.asarray([0.0, 0.0, 20.0])
        intr = jnp.tile(
            jnp.asarray([[[718.0, 0, 640], [0, 718.0, 192], [0, 0, 1]]], jnp.float32),
            (B, 1, 1),
        )
        variables = model.init(jax.random.key(0), rgb, lidar, intr, train=False)
        fwd = jax.jit(lambda v, r, l, i: model.apply(v, r, l, i, train=False)["out3"])
        timeit("forward", fwd, variables, rgb, lidar, intr)
        batch = {
            "rgb": rgb, "lidar": lidar, "intrinsic": intr,
            "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (B, 1)),
            "decalib_t_gt": jnp.zeros((B, 3)),
        }
        state = create_train_state(model, variables, steps_per_epoch=100)
        step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
        timeit_step("train step", step, state, batch)


if __name__ == "__main__":
    main()
