"""Sub-decompose proj level-1 (projection+lv1 = 38.6 ms, lv1 ~20.5 ms):
window select vs feature gather vs MLP+max, as full jitted graphs."""

from __future__ import annotations

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

from i2pnet_tpu.config import I2PNetProjConfig
from i2pnet_tpu.ops.projection import (
    spherical_project,
    select_window_features,
    window_neighbor_select_grid,
)

B, N, H, W = 8, 150000, 64, 1800


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
    cfg = I2PNetProjConfig()
    rng = np.random.default_rng(0)
    raw_np = rng.normal(size=(B, N, 3)).astype(np.float32) * 15
    raw_np[:, 120000:] = 0.0
    raw = jnp.asarray(raw_np)
    lidar = raw  # geometry only; decalib irrelevant for timing

    out_h, out_w = cfg.lidar_Hs[0], cfg.lidar_Ws[0]
    ksz = cfg.kernel_sizes[0]
    qstride = (cfg.stride_Hs[0], cfg.stride_Ws[0])
    nsample = cfg.lidar_group_samples[0]
    dist = cfg.down_conv_dis[0]

    def proj_only(raw_xyz, lidar_xyz):
        feats0 = jnp.zeros((B, N, 3), raw_xyz.dtype)
        raw_grid, (norm_grid, xyz_grid) = spherical_project(
            raw_xyz, [feats0, lidar_xyz], cfg.init_H, cfg.init_W,
            cfg.fup, cfg.fdown, use_rank=cfg.rank,
            ref_pad_quirk=cfg.ref_pad_quirk)
        return raw_grid

    t0 = timeit("projection", jax.jit(proj_only), raw, lidar)

    def proj_select(raw_xyz, lidar_xyz):
        feats0 = jnp.zeros((B, N, 3), raw_xyz.dtype)
        raw_grid, (norm_grid, xyz_grid) = spherical_project(
            raw_xyz, [feats0, lidar_xyz], cfg.init_H, cfg.init_W,
            cfg.fup, cfg.fdown, use_rank=cfg.rank,
            ref_pad_quirk=cfg.ref_pad_quirk)
        args, m = window_neighbor_select_grid(
            xyz_grid, xyz_grid, out_h, out_w, qstride, ksz, nsample,
            stride=(1, 1), distance=dist, shift=True, copy=True)
        return args[1].sum() + m.sum()

    t1 = timeit("projection+window_select", jax.jit(proj_select), raw, lidar)

    def proj_select_gather(raw_xyz, lidar_xyz):
        feats0 = jnp.zeros((B, N, 3), raw_xyz.dtype)
        raw_grid, (norm_grid, xyz_grid) = spherical_project(
            raw_xyz, [feats0, lidar_xyz], cfg.init_H, cfg.init_W,
            cfg.fup, cfg.fdown, use_rank=cfg.rank,
            ref_pad_quirk=cfg.ref_pad_quirk)
        args, m = window_neighbor_select_grid(
            xyz_grid, xyz_grid, out_h, out_w, qstride, ksz, nsample,
            stride=(1, 1), distance=dist, shift=True, copy=True)
        wargs = dict(out_h=out_h, out_w=out_w, qstride=qstride,
                     stride=(1, 1), kernel_size=ksz, shift=True)
        grouped = select_window_features(raw_grid, args, **wargs)
        return grouped.sum()

    t2 = timeit("projection+select+gather", jax.jit(proj_select_gather),
                raw, lidar)
    print(json.dumps({"window_select_ms": round(t1 - t0, 2),
                      "gather_ms": round(t2 - t1, 2)}), flush=True)


if __name__ == "__main__":
    main()
