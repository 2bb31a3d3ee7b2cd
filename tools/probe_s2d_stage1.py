#!/usr/bin/env python
"""Feasibility probe: width-to-depth (s2d) convs for the RGB encoder.

Premise (measured, tools/probe_free_hotspots.py + cost_analysis): XLA TPU
pads conv channel dims to 128 lanes, so every stage-1 conv (C=16) accesses
the bytes of a 128-channel conv (conv2 1.07 GB == conv128 1.008 GB);
stage 1 is ~7.5 of the encoder's 7.82 GB and the encoder is HBM-bound
(13.1 ms vs 9.5 ms roofline).

Fix under test: fold W-blocks of 8 into channels (phase-major), run the
3x3 conv as a (3,3)-cell conv over the s2d grid with a zero-structured
(3,3,8*Cin,8*Cout) kernel expanded in-graph from the original
(3,3,Cin,Cout) params — exact same math, ~128 real channels, no padding.
Pools/BN go through compact layout (reduce_window does not pad).

Times stage-1 (conv+scale/shift+lrelu+pool x5, bench shapes, bf16)
forward and grad for native vs s2d. A win here motivates integrating into
RGBEncoderStage; the in-situ A/B still decides (CLAUDE.md rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_i2pnet_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

B, H, W = 8, 384, 1280
CH = (16, 16, 16, 16, 32)
ST = (2, 1, 1, 1, 2)
CIN = 3


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


def cost(name, fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    a = c.cost_analysis()
    if isinstance(a, list):
        a = a[0]
    print(json.dumps({"cost": name,
                      "gbytes": round(a.get("bytes accessed", 0) / 1e9, 2),
                      "gflops": round(a.get("flops", 0) / 1e9, 1)}), flush=True)


def pool3(x, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, s, s, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def expand_kernel_s2d(w, b):
    """(3, 3, Cin, Cout) -> (3, 3, b*Cin, b*Cout) zero-structured kernel:
    out cell kw' in {0,1,2}, phases pin/pout; original column offset
    dw = b*(kw'-1) + pin - pout must be in {-1, 0, 1}."""
    kwp = np.arange(3)[:, None, None]
    pin = np.arange(b)[None, :, None]
    pout = np.arange(b)[None, None, :]
    dw = b * (kwp - 1) + pin - pout  # (3, b, b)
    mask = (dw >= -1) & (dw <= 1)
    kw_idx = np.clip(dw + 1, 0, 2)
    # w[kh, kw_idx, cin, cout] with kh broadcast
    sel = w[:, jnp.asarray(kw_idx)]          # (3, 3, b, b, Cin, Cout)
    sel = sel * jnp.asarray(mask, w.dtype)[None, :, :, :, None, None]
    sel = jnp.transpose(sel, (0, 1, 2, 4, 3, 5))  # (3,3,b,Cin,b,Cout)
    Cin, Cout = w.shape[2], w.shape[3]
    return sel.reshape(3, 3, b * Cin, b * Cout)


def to_s2d(x, b):
    Bx, Hx, Wx, Cx = x.shape
    return x.reshape(Bx, Hx, Wx // b, b * Cx)


def from_s2d(x, b):
    Bx, Hx, Wp, BC = x.shape
    return x.reshape(Bx, Hx, Wp * b, BC // b)


def conv_s2d(x_s2d, w, b):
    wk = expand_kernel_s2d(w, b).astype(jnp.bfloat16)
    return jax.lax.conv_general_dilated(
        x_s2d.astype(jnp.bfloat16), wk, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_native(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))


def make_params(rng):
    ws, scales, biases = [], [], []
    cin = CIN
    for ch in CH:
        ws.append(jnp.asarray(
            rng.normal(size=(3, 3, cin, ch)).astype(np.float32)) * 0.1)
        scales.append(jnp.asarray(rng.normal(size=(ch,)).astype(np.float32)))
        biases.append(jnp.asarray(rng.normal(size=(ch,)).astype(np.float32)))
        cin = ch
    return ws, scales, biases


def stage_native(params, x):
    ws, scales, biases = params
    for w, sc, bi, s in zip(ws, scales, biases, ST):
        x = conv_native(x, w)
        x = x.astype(jnp.float32)
        x = x * sc + bi                      # inference BN shape
        x = jax.nn.leaky_relu(x, 0.1)
        x = x.astype(jnp.bfloat16)
        x = pool3(x, s)
    return x


def stage_s2d(params, x, b=8):
    ws, scales, biases = params
    for w, sc, bi, s in zip(ws, scales, biases, ST):
        xs = to_s2d(x, b)
        xs = conv_s2d(xs, w, b)
        xs = xs.astype(jnp.float32)
        xs = xs * jnp.tile(sc, b) + jnp.tile(bi, b)
        xs = jax.nn.leaky_relu(xs, 0.1)
        xs = xs.astype(jnp.bfloat16)
        x = from_s2d(xs, b)
        x = pool3(x, s)
    return x


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CIN)).astype(np.float32))
    params = make_params(rng)

    # numerics check (CPU-precision tolerance is not the point here; bf16
    # accumulation-order deltas only)
    a = jax.jit(stage_native)(params, x)
    bq = jax.jit(stage_s2d)(params, x)
    sync(a), sync(bq)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bq.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(a.astype(jnp.float32))))
    print(json.dumps({"max_abs_diff": diff, "max_abs": ref}), flush=True)

    cost("stage1_native_fwd", stage_native, params, x)
    cost("stage1_s2d_fwd", stage_s2d, params, x)
    timeit("stage1_native_fwd", jax.jit(stage_native), params, x)
    timeit("stage1_s2d_fwd", jax.jit(stage_s2d), params, x)

    def loss_native(p, x):
        return jnp.sum(stage_native(p, x).astype(jnp.float32))

    def loss_s2d(p, x):
        return jnp.sum(stage_s2d(p, x).astype(jnp.float32))

    cost("stage1_native_grad", jax.grad(loss_native), params, x)
    cost("stage1_s2d_grad", jax.grad(loss_s2d), params, x)
    timeit("stage1_native_grad", jax.jit(jax.grad(loss_native)), params, x)
    timeit("stage1_s2d_grad", jax.jit(jax.grad(loss_s2d)), params, x)


if __name__ == "__main__":
    main()
