"""Decompose the projection-model forward (51 ms @ B=8) by stage on TPU.

Times jitted SUB-GRAPHS built from the real model's own modules and the
full model's params (never standalone micro-ops — CLAUDE.md dispatch-floor
rule): RGB encoder, spherical projection, the 4-level ProjectPointNet
pyramid, and the full forward. The residual (full - stages) is the
cost-volume/upconv/head tail. Directs where (if anywhere) proj-forward
optimization effort should go next.
"""

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
from i2pnet_tpu.models import I2PNetProj
from i2pnet_tpu.nn.layers import RGBEncoder
from i2pnet_tpu.nn.proj_backbone import ProjectPointNet
from i2pnet_tpu.ops import quaternion as Q
from i2pnet_tpu.ops.projection import spherical_project

BATCH = 8


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


def main(train=False):
    cfg = I2PNetProjConfig()
    model = I2PNetProj(cfg)
    rng = np.random.default_rng(0)
    B, N = BATCH, 150000
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
    params, bstats = variables["params"], variables["batch_stats"]
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    print(f"train={train}", flush=True)
    def full_fwd(v, r, l, w, i):
        if train:
            out, _ = model.apply(v, r, l, w, i, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.key(0)})
        else:
            out = model.apply(v, r, l, w, i, train=False)
        return out["out3"]

    t_full = timeit("full_forward", jax.jit(full_fwd),
                    variables, rgb, lidar, raw, intr)

    # RGB encoder with the real params subtree
    enc = RGBEncoder(cfg.rgb_encoder_channels, dtype=cdt,
                     bn_compute_dtype=cfg.encoder_bn_compute_dtype,
                     name="rgb_encoder")

    def rgb_fwd(p, bs, x):
        v = {"params": p["rgb_encoder"],
             "batch_stats": bs.get("rgb_encoder", {})}
        if train:
            outs, _ = enc.apply(v, x, True, mutable=["batch_stats"])
        else:
            outs = enc.apply(v, x, False)
        return outs[-1]

    t_rgb = timeit("rgb_encoder", jax.jit(rgb_fwd), params, bstats, rgb)

    # spherical projection alone
    def proj_fn(raw_xyz, lidar_xyz):
        feats0 = jnp.zeros((B, raw_xyz.shape[1], 3), raw_xyz.dtype)
        raw_grid, (norm_grid, xyz_grid) = spherical_project(
            raw_xyz, [feats0, lidar_xyz], cfg.init_H, cfg.init_W,
            cfg.fup, cfg.fdown, use_rank=cfg.rank,
            ref_pad_quirk=cfg.ref_pad_quirk,
        )
        return raw_grid

    t_proj = timeit("spherical_project", jax.jit(proj_fn), raw, lidar)

    # projection + full 4-level pyramid with the real params
    Hs, Ws = cfg.lidar_Hs, cfg.lidar_Ws
    mlps = cfg.lidar_encoder_mlps

    def make_lv(i, nsample, mlp, name):
        return ProjectPointNet(
            out_h=Hs[i], out_w=Ws[i], stride_h=cfg.stride_Hs[i],
            stride_w=cfg.stride_Ws[i], kernel_size=cfg.kernel_sizes[i],
            nsample=nsample, distance=cfg.down_conv_dis[i], mlp=mlp,
            use_trans=cfg.use_trans, use_bn=cfg.use_bn_p, dtype=cdt,
            name=name,
        )

    def pyramid_fn(p, raw_xyz, lidar_xyz):
        feats0 = jnp.zeros((B, raw_xyz.shape[1], 3), raw_xyz.dtype)
        raw_grid, (norm_grid, xyz_grid) = spherical_project(
            raw_xyz, [feats0, lidar_xyz], cfg.init_H, cfg.init_W,
            cfg.fup, cfg.fdown, use_rank=cfg.rank,
            ref_pad_quirk=cfg.ref_pad_quirk,
        )
        rf = cfg.raw_feat_point
        lv = make_lv(0, cfg.lidar_group_samples[0], mlps[0], "lidar_lv1")
        P1_raw, P1, LF1 = lv.apply(
            {"params": p["lidar_lv1"]}, raw_grid, xyz_grid, norm_grid,
            center_mode=True, using_intens=cfg.using_intens,
            raw_feat_point=rf, train=train,
        )
        lv = make_lv(1, cfg.lidar_group_samples[1], mlps[1], "lidar_lv2")
        P2_raw, P2, LF2 = lv.apply(
            {"params": p["lidar_lv2"]}, P1_raw, P1, LF1,
            raw_feat_point=rf, train=train,
        )
        lv = make_lv(2, cfg.lidar_group_samples[2], mlps[2], "lidar_lv3")
        P3_raw, P3, LF3 = lv.apply(
            {"params": p["lidar_lv3"]}, P2_raw, P2, LF2,
            raw_feat_point=rf, train=train,
        )
        lv = make_lv(3, cfg.lidar_group_samples[3], mlps[3], "lidar_lv4")
        P4_raw, P4, LF4 = lv.apply(
            {"params": p["lidar_lv4"]}, P3_raw, P3, LF3,
            raw_feat_point=rf, train=train,
        )
        return LF4

    t_pyr = timeit("projection+pyramid", jax.jit(pyramid_fn), params, raw, lidar)

    tail = t_full - t_rgb - t_pyr
    print(json.dumps({
        "stage": "tail (cost volumes + upconv + heads, by subtraction)",
        "ms": round(tail, 2),
        "note": f"pyramid minus projection ~ {round(t_pyr - t_proj, 2)} ms",
    }), flush=True)


def pyramid_prefixes():
    """Time pyramid prefixes (projection+lv1, +lv2, ...) to locate the
    dominant level. Run via: python tools/decompose_proj_forward.py levels
    """
    cfg = I2PNetProjConfig()
    model = I2PNetProj(cfg)
    rng = np.random.default_rng(0)
    B, N = BATCH, 150000
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
    params = variables["params"]
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    Hs, Ws = cfg.lidar_Hs, cfg.lidar_Ws
    mlps = cfg.lidar_encoder_mlps

    def make_lv(i, nsample, mlp, name):
        return ProjectPointNet(
            out_h=Hs[i], out_w=Ws[i], stride_h=cfg.stride_Hs[i],
            stride_w=cfg.stride_Ws[i], kernel_size=cfg.kernel_sizes[i],
            nsample=nsample, distance=cfg.down_conv_dis[i], mlp=mlp,
            use_trans=cfg.use_trans, use_bn=cfg.use_bn_p, dtype=cdt,
            name=name,
        )

    def prefix(depth):
        def fn(p, raw_xyz, lidar_xyz):
            feats0 = jnp.zeros((B, raw_xyz.shape[1], 3), raw_xyz.dtype)
            raw_grid, (norm_grid, xyz_grid) = spherical_project(
                raw_xyz, [feats0, lidar_xyz], cfg.init_H, cfg.init_W,
                cfg.fup, cfg.fdown, use_rank=cfg.rank,
                ref_pad_quirk=cfg.ref_pad_quirk,
            )
            rf = cfg.raw_feat_point
            lv = make_lv(0, cfg.lidar_group_samples[0], mlps[0], "lidar_lv1")
            state = lv.apply(
                {"params": p["lidar_lv1"]}, raw_grid, xyz_grid, norm_grid,
                center_mode=True, using_intens=cfg.using_intens,
                raw_feat_point=rf, train=False,
            )
            for i in range(1, depth):
                lv = make_lv(i, cfg.lidar_group_samples[i], mlps[i],
                             f"lidar_lv{i+1}")
                state = lv.apply(
                    {"params": p[f"lidar_lv{i+1}"]}, *state,
                    raw_feat_point=rf, train=False,
                )
            return state[2]

        return fn

    for depth in (1, 2, 3, 4):
        timeit(f"projection+lv1..{depth}", jax.jit(prefix(depth)),
               params, raw, lidar)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "levels":
        pyramid_prefixes()
    else:
        main(train="--train" in sys.argv)
