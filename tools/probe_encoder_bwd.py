#!/usr/bin/env python
"""Attribute the fused RGB-encoder backward at production shapes.

Round-4d located the remaining free-train headroom "in the encoder
backward" via grad-subset timing, but grad(only rgb_encoder) also pays
the downstream (cost-volume) backward chain, so that number is an upper
bound. This probe times the ENCODER STACK ALONE (B=8, 384x1280, bf16,
fused train path) to get the true split:

  * fwd               — fused_stage_train forward
  * grad_x            — grad wrt input only: every conv dW pallas pass is
                        dead code (custom_vjp returns it but XLA DCEs the
                        unused conv_phase_dw call), isolating dx+pool bwd
  * grad_all          — grad wrt (input, params): adds the dW passes
  * per-stage         — stages 1..3 cumulatively, so stage deltas fall out

Run on a QUIET host; 20-iter windows per CLAUDE.md timing rule.
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
from i2pnet_tpu.nn.layers import RGBEncoder


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
    print(f"{tag:32s} {ms:8.2f} ms (compile {c:5.1f} s)", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", type=int, default=0,
                    help="0 = all three, else first N stages")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    cfg = I2PNetConfig()
    stages = cfg.rgb_encoder_channels
    if args.stages:
        stages = stages[: args.stages]
    B, H, W = args.batch, 384, 1280
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))

    for n in range(1, len(stages) + 1):
        m = RGBEncoder(stages[:n], dtype=jnp.bfloat16)
        v = m.init(jax.random.key(0), x, train=False)
        params, bs = v["params"], v.get("batch_stats", {})

        def apply_sum(p, xx, _m=m, _bs=bs):
            outs, _ = _m.apply(
                {"params": p, "batch_stats": _bs}, xx, train=True,
                mutable=["batch_stats"])
            return sum(o.astype(jnp.float32).sum() for o in outs)

        fwd = jax.jit(apply_sum)
        grad_x = jax.jit(jax.grad(apply_sum, argnums=1))
        grad_all = jax.jit(jax.grad(apply_sum, argnums=(0, 1)))

        print(f"--- stages 1..{n}", flush=True)
        timeit("fwd", fwd, params, x, iters=args.iters)
        timeit("grad_x (dW passes DCE'd)", grad_x, params, x,
               iters=args.iters)
        timeit("grad_all (+dW)", grad_all, params, x, iters=args.iters)


if __name__ == "__main__":
    main()
