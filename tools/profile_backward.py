#!/usr/bin/env python
"""Decompose the free-point train step's backward cost on TPU.

Measures (forced-completion timing — see tools/profile_tpu.py):
  1. forward-only
  2. full train step (fwd + loss + bwd + Adam)
  3. train step with the gather VJPs replaced by a cheap fake (isolates the
     scatter-add cost of the KNN/packed gathers' transpose)
  4. scatter-op inventory of the compiled step's optimized HLO

Usage: python tools/profile_backward.py [--batch 8] [--fake-gather-vjp]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--skip-fake", action="store_true")
    args = ap.parse_args()

    import jax

    # dedicated axon cache (NEVER share with CPU runs; remote AOT entries
    # poison a CPU-read cache)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon_r2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    import jax.numpy as jnp

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from i2pnet_tpu.train import create_train_state, make_train_step

    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))

    cfg = dataclasses.replace(I2PNetConfig(), compute_dtype="bfloat16")
    model = I2PNet(cfg)
    rng = np.random.default_rng(0)
    B = args.batch
    rgb = jnp.asarray(rng.normal(size=(B, 384, 1280, 3)).astype(np.float32))
    lidar = jnp.asarray(
        rng.uniform(-10, 10, size=(B, cfg.lidar_in_points, 3)).astype(np.float32)
    ) + jnp.asarray([0.0, 0.0, 20.0])
    intr = jnp.tile(
        jnp.asarray([[[718.0, 0, 640], [0, 718.0, 192], [0, 0, 1]]], jnp.float32),
        (B, 1, 1),
    )
    variables = model.init(jax.random.key(0), rgb, lidar, intr, train=False)
    batch = {
        "rgb": rgb, "lidar": lidar, "intrinsic": intr,
        "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (B, 1)),
        "decalib_t_gt": jnp.zeros((B, 3)),
    }

    # ---- forward only
    fwd = jax.jit(lambda v, r, l, i: model.apply(v, r, l, i, train=False)["out3"])
    out = fwd(variables, rgb, lidar, intr)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fwd(variables, rgb, lidar, intr)
    sync(out)
    fwd_ms = (time.perf_counter() - t0) / 10 * 1000
    print(f"forward:             {fwd_ms:8.2f} ms", flush=True)

    def time_step(step, tag):
        state = create_train_state(model, variables, steps_per_epoch=100)
        t_c = time.perf_counter()
        state, m = step(state, batch, jax.random.key(0))
        sync(m["loss"])
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for i in range(5):
            state, m = step(state, batch, jax.random.key(i))
        sync(m["loss"])
        ms = (time.perf_counter() - t0) / 5 * 1000
        print(f"{tag}: {ms:8.2f} ms (compile {compile_s:.0f} s)", flush=True)
        return ms

    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    step_ms = time_step(step, "train step:         ")

    # ---- scatter inventory from the optimized HLO
    try:
        state = create_train_state(model, variables, steps_per_epoch=100)
        compiled = (
            jax.jit(make_train_step(model, cfg))
            .lower(state, batch, jax.random.key(0))
            .compile()
        )
        txt = compiled.as_text()
        import re

        scatters = [
            ln.strip() for ln in txt.splitlines() if re.search(r"= .* scatter\(", ln)
        ]
        print(f"scatter ops in optimized HLO: {len(scatters)}")
        for s in scatters[:40]:
            print("  ", s.split(" scatter(")[0][:140], flush=True)
    except Exception as e:
        print("HLO inventory failed:", e)

    if args.skip_fake:
        return

    # ---- fake-VJP ablation: same gather forward, O(1)-ish backward that
    # still produces a non-constant cotangent (so XLA can't DCE upstream)
    from i2pnet_tpu.ops import pointops

    real_index_points = pointops.index_points

    @jax.custom_vjp
    def fake_grad_gather(points, idx):
        return real_index_points(points, idx)

    def fg_fwd(points, idx):
        return fake_grad_gather(points, idx), (points.shape, points.dtype, idx)

    def fg_bwd(res, ct):
        shape, dtype, idx = res
        mean = jnp.mean(ct, axis=tuple(range(1, ct.ndim - 1)))  # (B, C)
        d = jnp.broadcast_to(mean[:, None, :], shape).astype(dtype)
        return d, None

    fake_grad_gather.defvjp(fg_fwd, fg_bwd)
    pointops.index_points = fake_grad_gather
    try:
        import importlib

        import i2pnet_tpu.models.i2pnet as mi

        importlib.reload(mi)  # rebind module-level index_points import
        model2 = mi.I2PNet(cfg)
        step2 = jax.jit(make_train_step(model2, cfg), donate_argnums=(0,))
        fake_ms = time_step(step2, "step w/ fake gather VJP")
        print(f"=> scatter-add share of the step: {step_ms - fake_ms:8.2f} ms")
    finally:
        pointops.index_points = real_index_points
        import importlib

        import i2pnet_tpu.models.i2pnet as mi

        importlib.reload(mi)


if __name__ == "__main__":
    main()
