#!/usr/bin/env python
"""Attribute the free-point train step's NON-encoder backward.

Round-4g's grad-subset table (tools/decompose_backward.py) bounds the
point-branch backward at ~25 ms, but subset timing pays every op between
the loss and the subset, so sa_pyramid (13.9) and cost_volumes (16.3)
overlap. This probe times each point-branch MODULE IN ISOLATION at the
production shapes (B=8, free-point shipped config, bf16 compute), fwd and
grad wrt (params, float inputs), so the per-module backward cost falls
out without the shared chain.

Shapes (cfg.lidar_layer_points = 2048/1024/256/64, RF3 12x40=480 px):
  lv1  8192 -> 2048, K=32, mlp (16,16,32)     lv2  2048 -> 1024, K=16
  lv3  1024 ->  256, K=16                     lv4   256 ->   64, K=16
  layer_idx 256 -> 64 (reused fps idx), K=16, mlp (128,64,64)
  cv1  N=256, K=480 (all pixels), bval=True   cv2  N=256, K=32 grouped
  upconv x2: 256 <- 64, K=8

Run on a QUIET host; >=20-iter windows per CLAUDE.md timing rule.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_i2pnet_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from i2pnet_tpu.config import I2PNetConfig
from i2pnet_tpu.nn.costvolume import CostVolume
from i2pnet_tpu.nn.pointnet import PointNetSetAbstraction
from i2pnet_tpu.nn.upconv import SetUpconv


def sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(tag, fn, *a, iters=20):
    t0 = time.perf_counter()
    sync(fn(*a))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{tag:40s} {ms:8.2f} ms (compile {c:5.1f} s)", flush=True)
    return ms


def probe(tag, module, inputs, iters, grad_argnums=None):
    """Time module fwd and grad wrt (params + float inputs)."""
    v = module.init(jax.random.key(0), *inputs, train=False)
    params = v["params"]
    bs = v.get("batch_stats", {})

    def apply_sum(p, *xs):
        out = module.apply(
            {"params": p, "batch_stats": bs}, *xs, train=True,
            mutable=["batch_stats"])[0]
        leaves = jax.tree_util.tree_leaves(out)
        return sum(l.astype(jnp.float32).sum() for l in leaves
                   if jnp.issubdtype(l.dtype, jnp.floating))

    if grad_argnums is None:
        grad_argnums = (0,) + tuple(
            1 + i for i, x in enumerate(inputs)
            if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating)
        )
    fwd = jax.jit(apply_sum)
    grad = jax.jit(jax.grad(apply_sum, argnums=grad_argnums))
    f = timeit(f"{tag} fwd", fwd, params, *inputs, iters=iters)
    g = timeit(f"{tag} grad", grad, params, *inputs, iters=iters)
    print(f"{tag + ' bwd-only':40s} {g - f:8.2f} ms", flush=True)
    return f, g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default="",
                    help="comma list: lv1,lv2,lv3,lv4,layer_idx,cv1,cv2,up")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    cfg = I2PNetConfig()
    cdt = jnp.bfloat16
    B = args.batch
    pts = cfg.lidar_layer_points  # (2048, 1024, 256, 64)
    mlps = cfg.lidar_encoder_mlps
    rng = np.random.default_rng(0)

    def pc(n):
        return jnp.asarray(
            rng.uniform(-10, 10, size=(B, n, 3)).astype(np.float32)
        ) + jnp.asarray([0.0, 0.0, 20.0])

    def feat(n, c):
        return jnp.asarray(rng.normal(size=(B, n, c)).astype(np.float32))

    want = set(args.only.split(",")) if args.only else None

    def on(k):
        return want is None or k in want

    levels = [
        ("lv1", cfg.lidar_in_points, pts[0], cfg.lidar_group_samples[0],
         mlps[0], 3, dict(feat_mode=cfg.featmode)),
        ("lv2", pts[0], pts[1], cfg.lidar_group_samples[1], mlps[1], 32, {}),
        ("lv3", pts[1], pts[2], cfg.lidar_group_samples[2], mlps[2], 64, {}),
        ("lv4", pts[2], pts[3], cfg.lidar_group_samples[3], mlps[3], 128, {}),
    ]
    for name, n_in, n_out, k, mlp, c_in, extra in levels:
        if not on(name):
            continue
        m = PointNetSetAbstraction(n_out, k, mlp, dtype=cdt, name=name)
        xyz = pc(n_in)
        f = feat(n_in, c_in)

        def call(p, xyz, f, _m=m, _extra=extra):
            out, _ = _m.apply(
                {"params": p, "batch_stats": {}}, xyz, f, raw_xyz=xyz,
                train=True, mutable=["batch_stats"], **_extra)
            return out[1].astype(jnp.float32).sum()

        v = m.init(jax.random.key(0), xyz, f, raw_xyz=xyz, **extra)
        fwd = jax.jit(call)
        # grad wrt (params, features) only: coordinates are param-independent
        # in the real model, so no tangent ever reaches FPS/KNN (and
        # fps_pallas has no JVP rule) — matches the real backward path,
        # where the feature gather's transpose (scatter into (B,N,C)) IS
        # paid at lv2+.
        grad = jax.jit(jax.grad(call, argnums=(0, 2)))
        fms = timeit(f"{name} fwd", fwd, v["params"], xyz, f, iters=args.iters)
        gms = timeit(f"{name} grad", grad, v["params"], xyz, f,
                     iters=args.iters)
        print(f"{name + ' bwd-only':40s} {gms - fms:8.2f} ms", flush=True)

    if on("layer_idx"):
        m = PointNetSetAbstraction(
            pts[3], cfg.lidar_group_samples[4], mlps[4], dtype=cdt)
        xyz = pc(pts[2])
        f = feat(pts[2], cfg.cost_volume_mlps[1][-1])
        sidx = jnp.tile(jnp.arange(pts[3], dtype=jnp.int32)[None], (B, 1))

        def call(p, xyz, f, _m=m):
            out, _ = _m.apply(
                {"params": p, "batch_stats": {}}, xyz, f, sample_idx=sidx,
                raw_xyz=xyz, train=True, mutable=["batch_stats"])
            return out[1].astype(jnp.float32).sum()

        v = m.init(jax.random.key(0), xyz, f, sample_idx=sidx, raw_xyz=xyz)
        fwd = jax.jit(call)
        grad = jax.jit(jax.grad(call, argnums=(0, 2)))
        fms = timeit("layer_idx fwd", fwd, v["params"], xyz, f,
                     iters=args.iters)
        gms = timeit("layer_idx grad", grad, v["params"], xyz, f,
                     iters=args.iters)
        print(f"{'layer_idx bwd-only':40s} {gms - fms:8.2f} ms", flush=True)

    # cost volumes at l3: N=256, pixels 12x40=480, C=128
    n3, hw, C = pts[2], 480, mlps[2][-1]
    uv = jnp.concatenate([pc(n3)[..., :2] * 0.02, jnp.ones((B, n3, 1))], -1)
    lf3 = feat(n3, C)
    rf_idx = jnp.concatenate(
        [feat(hw, 2) * 0.02, jnp.ones((B, hw, 1))], -1)
    rf = feat(hw, C)
    z = jnp.abs(feat(n3, 1)) + 1.0
    for name, nq, bval in (
        ("cv1", cfg.cost_volume_nsamples_q[0], cfg.backward_validation[0]),
        ("cv2", cfg.cost_volume_nsamples_q[1], cfg.backward_validation[1]),
    ):
        if not on(name):
            continue
        m = CostVolume(
            nsample=cfg.cost_volume_nsample, nsample_q=nq,
            mlp1=cfg.cost_volume_mlps[0], mlp2=cfg.cost_volume_mlps[1],
            corr_func=cfg.cost_volume_corr_func, backward_validation=bval,
            max_cost=cfg.max_cost, backward_fc=cfg.backward_fc, dtype=cdt,
            name=name)
        probe(name, m, (uv, lf3, rf_idx, rf, z), args.iters)

    if on("up"):
        p3, p4 = pc(pts[2]), pc(pts[3])
        l4f = feat(pts[3], cfg.setupconv_mlps[0][0][-1])
        m = SetUpconv(
            cfg.setupconv_nsamples[0], cfg.setupconv_mlps[0][0],
            cfg.setupconv_mlps[0][1], dtype=cdt)

        def call(p, p3, p4, lf3, l4f, _m=m):
            out, _ = _m.apply(
                {"params": p, "batch_stats": {}}, p3, p4, lf3, l4f,
                raw_xyz1=p3, raw_xyz2=p4, train=True,
                mutable=["batch_stats"])
            return out.astype(jnp.float32).sum()

        v = m.init(jax.random.key(0), p3, p4, lf3, l4f, raw_xyz1=p3,
                   raw_xyz2=p4)
        fwd = jax.jit(call)
        grad = jax.jit(jax.grad(call, argnums=(0, 3, 4)))
        fms = timeit("upconv fwd", fwd, v["params"], p3, p4, lf3, l4f,
                     iters=args.iters)
        gms = timeit("upconv grad", grad, v["params"], p3, p4, lf3, l4f,
                     iters=args.iters)
        print(f"{'upconv bwd-only':40s} {gms - fms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
