#!/usr/bin/env python
"""Decompose the FREE-POINT forward (the headline bench metric) by stage.

Times jitted subgraphs of the real model at bench shapes (B=8, 8192 pts,
384x1280, bf16 convs) by returning a single captured intermediate:
everything the returned value does not depend on is DCE'd by XLA, so each
timing is the true cost of that prefix in its fused context. Differences
between prefixes attribute time to stages (same methodology as
tools/decompose_proj_forward.py; >= 20 iters, quiet host per CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_i2pnet_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BATCH, IMG_H, IMG_W = 8, 384, 1280


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)
    return ms


def main():
    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet

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

    def prefix(filter_name):
        # return ONLY one module's captured output: XLA DCEs every op the
        # returned value does not depend on, leaving the fused prefix graph
        def fn(v, r, l, i):
            _, st = model.apply(
                v, r, l, i, train=False,
                capture_intermediates=lambda mdl, _:
                    mdl.name == filter_name,
                mutable=["intermediates"],
            )
            leaves = jax.tree_util.tree_leaves(st["intermediates"])
            if not leaves:
                raise ValueError(f"no intermediate captured for {filter_name}")
            # return EVERY leaf of the captured output (returning just one
            # would let XLA DCE the other outputs' compute, e.g. the SA
            # MLP when only sampled coords are kept)
            return tuple(leaves)
        return jax.jit(fn)

    t_full = timeit(
        "full_forward",
        jax.jit(lambda v, r, l, i:
                model.apply(v, r, l, i, train=False)["out3"]),
        variables, rgb, lidar, intrinsic,
    )
    t_rgb = timeit("rgb_encoder", prefix("rgb_encoder"),
                   variables, rgb, lidar, intrinsic)
    t_lv1 = timeit("pyramid_lv1", prefix("lidar_lv1"),
                   variables, rgb, lidar, intrinsic)
    t_lv4 = timeit("pyramid_lv1..4", prefix("lidar_lv4"),
                   variables, rgb, lidar, intrinsic)
    t_cv1 = timeit("rgb+pyr+cost_volume1", prefix("cost_volume1"),
                   variables, rgb, lidar, intrinsic)
    t_head4 = timeit("..+coarse_head", prefix("l4_head"),
                     variables, rgb, lidar, intrinsic)
    t_cv2 = timeit("..+warp+cost_volume2", prefix("cost_volume2"),
                   variables, rgb, lidar, intrinsic)
    print(json.dumps({
        "summary": {
            "full": round(t_full, 2),
            "rgb": round(t_rgb, 2),
            "pyramid": round(t_lv4 - 0.0, 2),
            "lv1_share": round(t_lv1, 2),
            "cv1_increment": round(t_cv1 - max(t_rgb, t_lv4), 2),
            "head4_increment": round(t_head4 - t_cv1, 2),
            "cv2_increment": round(t_cv2 - t_head4, 2),
            "tail_after_cv2": round(t_full - t_cv2, 2),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
