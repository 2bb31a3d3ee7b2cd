#!/usr/bin/env python
"""Bisect a train step's backward cost by param subtree (free-point
default; --proj for the projection family).

jax.grad w.r.t. a SUBSET of params only backprops to those params'
producing ops (XLA DCEs the rest of the reverse graph), so timing
grad-w.r.t.-subtree isolates each stage's backward share without touching
model code. Also prints forward(train mode), full grad, full step, and
compiled cost_analysis (flops / bytes) for the roofline picture.

Usage: python tools/decompose_backward.py [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


GROUPS = {
    "rgb_encoder": ("rgb_encoder",),
    "sa_pyramid": ("lidar_lv1", "lidar_lv2", "lidar_lv3", "lidar_lv4", "layer_idx"),
    "cost_volumes": ("cost_volume1", "cost_volume2"),
    "refine(upconv+flow)": (
        "set_upconv0_upsample",
        "set_upconv0_w_upsample",
        "flow_predictor0",
        "flow_predictor0_predict",
        "flow_predictor0_w",
    ),
    "heads(+sx,sq)": ("l3_head", "l4_head", "sx", "sq"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--proj", action="store_true",
                    help="decompose the projection-family train step "
                         "(150k-pt cloud, 64x1800 grid) instead of free-point")
    ap.add_argument("--dtype", default=None,
                    help="compute_dtype override; default bfloat16 for BOTH "
                         "families to match what bench.py ships (round-4 "
                         "advisor: the old proj default measured a different "
                         "executable than the benchmark)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon_r2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses
    import functools

    import jax.numpy as jnp

    from i2pnet_tpu.config import I2PNetConfig, I2PNetProjConfig
    from i2pnet_tpu.models import I2PNet, I2PNetProj
    from i2pnet_tpu.train import create_train_state, make_train_step
    from i2pnet_tpu.train.step import (
        _free_point_loss_fn,
        _proj_loss_fn,
        make_train_step_proj,
    )

    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))

    def timeit(tag, fn, *a, iters=8):
        t_c = time.perf_counter()
        out = fn(*a)
        sync(out)
        compile_s = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        sync(out)
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{tag:36s} {ms:8.2f} ms  (first {compile_s:5.1f} s)", flush=True)
        return ms

    rng = np.random.default_rng(0)
    B = args.batch
    if args.proj:
        cfg = dataclasses.replace(
            I2PNetProjConfig(), compute_dtype=args.dtype or "bfloat16")
        print(f"proj compute_dtype = {cfg.compute_dtype}", flush=True)
        model = I2PNetProj(cfg)
        N = 150000
        raw_np = rng.normal(size=(B, N, 3)).astype(np.float32) * 15
        raw_np[:, 120000:] = 0.0  # zero-pad tail like the real loader
        raw = jnp.asarray(raw_np)
        lidar = raw
        rgb = jnp.asarray(rng.normal(size=(B, 160, 512, 3)).astype(np.float32))
        intr = jnp.tile(
            jnp.asarray([[[350.0, 0, 256], [0, 350.0, 80], [0, 0, 1]]],
                        jnp.float32),
            (B, 1, 1),
        )
        variables = model.init(
            jax.random.key(0), rgb, lidar, raw, intr, train=False)
        batch = {
            "rgb": rgb, "lidar": lidar, "raw_xyz": raw, "intrinsic": intr,
            "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (B, 1)),
            "decalib_t_gt": jnp.zeros((B, 3)),
        }
        loss_fn = _proj_loss_fn(model, cfg)
        make_step = lambda: make_train_step_proj(model, cfg)
    else:
        cfg = dataclasses.replace(
            I2PNetConfig(), compute_dtype=args.dtype or "bfloat16")
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
        batch = {
            "rgb": rgb, "lidar": lidar, "intrinsic": intr,
            "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (B, 1)),
            "decalib_t_gt": jnp.zeros((B, 3)),
        }
        loss_fn = _free_point_loss_fn(model, cfg)
        make_step = lambda: make_train_step(model, cfg)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    key = jax.random.key(0)
    step0 = jnp.int32(0)

    # forward in train mode (what the step actually runs); batch passed as
    # an ARGUMENT — closure-captured device arrays become embedded HLO
    # constants and XLA constant-folds through them (compile blows up)
    fwd_train = jax.jit(
        lambda p, bs, b: loss_fn(p, bs, batch=b, rng=key, step=step0)[0]
    )
    fwd_ms = timeit("forward(train, loss)", fwd_train, params, batch_stats, batch)

    # full grad without optimizer
    full_grad = jax.jit(
        lambda p, bs, b: jax.grad(
            functools.partial(loss_fn, rng=key, step=step0),
            has_aux=True,
        )(p, batch_stats=bs, batch=b)[0]
    )
    grad_ms = timeit("grad(all params)", full_grad, params, batch_stats, batch)

    # grad w.r.t. each subtree group (others are frozen inputs)
    for gname, keys in GROUPS.items():
        sub = {k: params[k] for k in keys if k in params}
        rest = {k: v for k, v in params.items() if k not in keys}

        def loss_sub(psub, prest, bs, b):
            full = dict(prest)
            full.update(psub)
            return loss_fn(full, bs, batch=b, rng=key, step=step0)

        g = jax.jit(
            lambda ps, pr, bs, b, _ls=loss_sub: jax.grad(_ls, has_aux=True)(
                ps, pr, bs, b
            )[0]
        )
        timeit(f"grad(only {gname})", g, sub, rest, batch_stats, batch)

    # full train step (+Adam/clip)
    state = create_train_state(model, variables, steps_per_epoch=100)
    step = jax.jit(make_step(), donate_argnums=(0,))
    t_c = time.perf_counter()
    state, m = step(state, batch, key)
    sync(m["loss"])
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for i in range(8):
        state, m = step(state, batch, jax.random.key(i))
    sync(m["loss"])
    step_ms = (time.perf_counter() - t0) / 8 * 1000
    print(f"{'train step (grad+Adam+clip)':36s} {step_ms:8.2f} ms  (first {compile_s:5.1f} s)")

    # roofline: compiled cost analysis of grad and forward
    for tag, fn, a in [
        ("forward", fwd_train, (params, batch_stats, batch)),
        ("grad", full_grad, (params, batch_stats, batch)),
    ]:
        try:
            ca = fn.lower(*a).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops", float("nan"))
            bytes_ = ca.get("bytes accessed", float("nan"))
            print(
                f"cost[{tag}]: {flops/1e9:.1f} GFLOP, {bytes_/1e9:.2f} GB accessed"
                f" -> roofline {flops/394e12*1e3:.2f} ms (MXU) /"
                f" {bytes_/819e9*1e3:.2f} ms (HBM)"
            )
        except Exception as e:
            print(f"cost[{tag}] failed: {e}")

    print(f"\nbackward-only share: {grad_ms - fwd_ms:.1f} ms; opt overhead: "
          f"{step_ms - grad_ms:.1f} ms")


if __name__ == "__main__":
    main()
