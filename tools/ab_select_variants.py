#!/usr/bin/env python
"""In-situ A/B of window-select candidate builders on the projection model.

Measures the FULL jitted proj forward and train step (B=8, 150k pts,
64x1800) under each env combination, per the house rule that subgraph
alternatives are only judged inside the full step
(CLAUDE.md / BASELINE.md round-3: the im2col builder won standalone and
lost in situ).

Variants (round-4 surface; the full decision table is BASELINE.md
round-4b/4c):
  default         — shipped routing: gathered per-tensor selects at train,
                    dense multiplicity path (Pallas K-pass multiplicities,
                    take-based candidate builder) at eval on TPU
  no_dense_eval   — I2PNET_PROJ_DENSE_EVAL=0: gathered path at eval too

Usage: python tools/ab_select_variants.py [--iters 20] [--variants a,b]
"""

from __future__ import annotations

import argparse
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
from i2pnet_tpu.ops import quaternion as Q
from i2pnet_tpu.train import create_train_state
from i2pnet_tpu.train.step import make_train_step_proj

BATCH = 8
VARIANTS = {
    "default": {},
    "no_dense_eval": {"I2PNET_PROJ_DENSE_EVAL": "0"},
}


def sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def make_inputs(cfg):
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
    return rgb, lidar, raw, intr


def main():
    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="conv/MLP compute dtype (distance/Lie math stays f32 either "
        "way — same mixed-precision recipe as the free-point config)")
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()} dtype: {args.dtype}", flush=True)

    cfg = dataclasses.replace(I2PNetProjConfig(), compute_dtype=args.dtype)
    model = I2PNetProj(cfg)
    rgb, lidar, raw, intr = make_inputs(cfg)

    variables = model.init(jax.random.key(0), rgb, lidar, raw, intr, train=False)
    batch = {
        "rgb": rgb, "lidar": lidar, "raw_xyz": raw, "intrinsic": intr,
        "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (BATCH, 1)),
        "decalib_t_gt": jnp.zeros((BATCH, 3)),
    }

    for name in args.variants.split(","):
        env = VARIANTS[name]
        for k, v in env.items():
            os.environ[k] = v

        fwd = jax.jit(
            lambda v_, r, l, w, i: model.apply(v_, r, l, w, i, train=False)["out3"]
        )
        t0 = time.perf_counter()
        out = fwd(variables, rgb, lidar, raw, intr)
        sync(out)
        c_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(variables, rgb, lidar, raw, intr)
        sync(out)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "variant": name, "path": "fwd",
            "ms": round(dt / args.iters * 1e3, 2),
            "pairs_per_sec": round(BATCH * args.iters / dt, 1),
            "out0": float(jnp.asarray(out)[0, 0]),
            "compile_s": round(c_s, 1),
        }), flush=True)

        if not args.skip_train:
            fresh = jax.tree_util.tree_map(lambda t: t.copy(), variables)
            state = create_train_state(model, fresh, steps_per_epoch=100)
            step = jax.jit(make_train_step_proj(model, cfg), donate_argnums=(0,))
            t0 = time.perf_counter()
            state, m = step(state, batch, jax.random.key(0))
            sync(m["loss"])
            c_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(args.iters):
                state, m = step(state, batch, jax.random.key(i))
            sync(m["loss"])
            dt = time.perf_counter() - t0
            print(json.dumps({
                "variant": name, "path": "train",
                "ms": round(dt / args.iters * 1e3, 2),
                "pairs_per_sec": round(BATCH * args.iters / dt, 1),
                "loss": float(jax.device_get(m["loss"])),
                "compile_s": round(c_s, 1),
            }), flush=True)

        for k in env:
            os.environ.pop(k, None)


if __name__ == "__main__":
    main()
