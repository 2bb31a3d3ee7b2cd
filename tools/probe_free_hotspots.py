#!/usr/bin/env python
"""Probe the two free-forward hotspots found by decompose_free_forward:
the RGB encoder (13.3 ms) and pyramid lv1 (10.9 ms). Prints XLA
cost-analysis (flops / bytes) for the encoder subgraph and times FPS and
the lv1 grouping separately to attribute lv1's cost."""

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
    from i2pnet_tpu.nn.layers import RGBEncoder
    from i2pnet_tpu.ops import pointops as PO

    cfg = dataclasses.replace(I2PNetConfig(), compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(BATCH, IMG_H, IMG_W, 3)).astype(np.float32))

    enc = RGBEncoder(cfg.rgb_encoder_channels, dtype=jnp.bfloat16,
                     bn_compute_dtype=cfg.encoder_bn_compute_dtype)
    ev = enc.init(jax.random.key(0), rgb, False)

    fn = jax.jit(lambda v, x: tuple(enc.apply(v, x, False)))
    lowered = fn.lower(ev, rgb)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(json.dumps({
        "rgb_cost_analysis": {
            "gflops": round(ca.get("flops", 0) / 1e9, 1),
            "gbytes": round(ca.get("bytes accessed", 0) / 1e9, 2),
        }
    }), flush=True)
    timeit("rgb_encoder_alone", fn, ev, rgb)

    # lv1 pieces at bench shapes
    lidar = jnp.asarray(
        rng.uniform(-10, 10, size=(BATCH, cfg.lidar_in_points, 3)).astype(np.float32)
    )
    npoint = cfg.lidar_layer_points[0]
    nsample = cfg.lidar_group_samples[0]
    print(json.dumps({"lv1_shapes": {"N": int(cfg.lidar_in_points),
                                     "npoint": int(npoint),
                                     "nsample": int(nsample)}}), flush=True)

    fps = jax.jit(lambda x: PO.farthest_point_sample(x, npoint))
    timeit("fps_lv1", fps, lidar)

    fps_idx = fps(lidar)

    def knn(x, idx):
        new_xyz = PO.index_points(x, idx)
        return PO.knn_point(nsample, x, new_xyz)

    timeit("knn_lv1", jax.jit(knn), lidar, fps_idx)

    def sag(x):
        feats0 = jnp.zeros((x.shape[0], x.shape[1], 3), x.dtype)
        return PO.sample_and_group(npoint, nsample, x, feats0)

    timeit("sample_and_group_lv1(incl fps+knn)", jax.jit(sag), lidar)


if __name__ == "__main__":
    main()
