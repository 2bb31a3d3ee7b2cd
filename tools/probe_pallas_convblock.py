#!/usr/bin/env python
"""Correctness + perf probe for the fused Pallas encoder block.

Modes:
  python tools/probe_pallas_convblock.py check   # CPU interpret-mode parity
  python tools/probe_pallas_convblock.py tpu     # real-TPU timing vs native
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

from i2pnet_tpu.ops.conv_pallas import (
    fold_bn_eval, fused_conv_block, fused_encoder_stage, pack_block_weights,
)


def native_block(x_bhwc, w, scale, shift, stride):
    """Reference: conv(bf16) -> f32 scale/shift -> lrelu -> bf16 -> pool."""
    y = jax.lax.conv_general_dilated(
        x_bhwc.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * scale + shift
    y = jnp.where(y >= 0, y, 0.1 * y).astype(jnp.bfloat16)
    return jax.lax.reduce_window(
        y, jnp.asarray(-jnp.inf, y.dtype), jax.lax.max,
        (1, 3, 3, 1), (1, stride, stride, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def check_one(B, H, W, cin, cout, stride, ht_out, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, H, W, cin)).astype(np.float32))
    w = jnp.asarray(0.3 * rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    ref = np.asarray(native_block(x, w, scale, shift, stride), np.float32)

    from i2pnet_tpu.ops.conv_pallas import _pad_cin

    cin_p = _pad_cin(cin)
    P = 128 // cin_p
    wp = pack_block_weights(w).astype(jnp.bfloat16)
    sc = jnp.tile(scale, P)[None, :]
    sh = jnp.tile(shift, P)[None, :]
    xp = x if cin_p == cin else jnp.pad(
        x, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin)))
    got = fused_conv_block(
        xp.reshape(B, H, W * cin_p), wp, sc, sh,
        H=H, W=W, cin=cin_p, cout=cout, stride=stride, ht_out=ht_out,
        interpret=True,
    )
    got = np.asarray(got, np.float32).reshape(ref.shape)
    err = float(np.max(np.abs(got - ref)))
    scale_mag = float(np.max(np.abs(ref)))
    status = "OK" if err <= 0.03 * max(scale_mag, 1.0) else "FAIL"
    print(json.dumps({
        "case": f"B{B} {H}x{W} {cin}->{cout} s{stride} ht{ht_out}",
        "max_abs_err": round(err, 5), "ref_mag": round(scale_mag, 2),
        "status": status,
    }), flush=True)
    return status == "OK"


def run_checks():
    jax.config.update("jax_platforms", "cpu")
    ok = True
    ok &= check_one(2, 16, 32, 16, 16, 1, 8)     # stage-1 interior block
    ok &= check_one(2, 16, 32, 16, 16, 2, 4)     # stride-2 pool
    ok &= check_one(2, 16, 32, 3, 16, 2, 4)      # first block, cin=3
    ok &= check_one(2, 16, 32, 16, 32, 2, 4)     # block 5, P=4
    ok &= check_one(2, 8, 16, 32, 64, 1, 4)      # stage-2 widths
    ok &= check_one(1, 8, 16, 64, 128, 2, 2)     # P=1 widest
    ok &= check_one(2, 12, 32, 16, 16, 1, 4)     # H not multiple of ht (12/4)
    print("ALL OK" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(leaf.ravel()[0]))


def _timeit(name, fn, *args, iters=30):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(json.dumps({"bench": name, "ms": round(ms, 2)}), flush=True)
    return ms


def run_tpu():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_i2pnet_axon")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    B, H, W = 8, 384, 1280
    stages = (
        (3, (16, 16, 16, 16, 32), (2, 1, 1, 1, 2)),
        (32, (32, 32, 32, 32, 64), (2, 1, 1, 1, 2)),
        (64, (64, 64, 64, 64, 128), (1, 1, 1, 1, 2)),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))

    params = []
    for cin0, chans, strides in stages:
        cin = cin0
        blocks = []
        for ch in chans:
            w = jnp.asarray(
                (0.3 / np.sqrt(9 * cin)) *
                rng.normal(size=(3, 3, cin, ch)).astype(np.float32))
            sc = jnp.asarray(rng.normal(size=(ch,)).astype(np.float32))
            sh = jnp.asarray(rng.normal(size=(ch,)).astype(np.float32))
            blocks.append((w, sc, sh))
            cin = ch
        params.append(blocks)

    def native_all(params, x):
        outs = []
        for (cin0, chans, strides), blocks in zip(stages, params):
            for (w, sc, sh), s in zip(blocks, strides):
                x = native_block(x, w, sc, sh, s)
            outs.append(x)
        return outs

    def fused_stage_params(blocks, chans):
        from i2pnet_tpu.ops.conv_pallas import _pad_cin

        packed = []
        for (w, sc, sh), ch in zip(blocks, chans):
            P = 128 // _pad_cin(int(w.shape[2]))
            packed.append((
                pack_block_weights(w).astype(jnp.bfloat16),
                jnp.tile(sc, P)[None, :], jnp.tile(sh, P)[None, :],
            ))
        return packed

    def fused_all(params, x):
        outs = []
        Hc, Wc = H, W
        for (cin0, chans, strides), blocks in zip(stages, params):
            packed = fused_stage_params(blocks, chans)
            x = fused_encoder_stage(
                x, packed, H=Hc, W=Wc, cin=cin0,
                channels=chans, strides=strides)
            for s in strides:
                Hc, Wc = Hc // s, Wc // s
            outs.append(x)
        return outs

    def fused_stage1_only(params, x):
        """Pallas stage 1, native stages 2-3 (the padded traffic is stage 1)."""
        outs = []
        cin0, chans, strides = stages[0]
        packed = fused_stage_params(params[0], chans)
        x = fused_encoder_stage(
            x, packed, H=H, W=W, cin=cin0, channels=chans, strides=strides)
        x = x.astype(jnp.float32)
        outs.append(x)
        for (cin0, chans, strides), blocks in zip(stages[1:], params[1:]):
            for (w, sc, sh), s in zip(blocks, strides):
                x = native_block(x, w, sc, sh, s)
            outs.append(x)
        return outs

    jn = jax.jit(native_all)
    jf = jax.jit(fused_all)
    j1 = jax.jit(fused_stage1_only)

    # numerics sanity at full scale
    a = jn(params, x)
    b = jf(params, x)
    _sync(a[-1]); _sync(b[-1])
    for k, (u, v) in enumerate(zip(a, b)):
        d = float(jnp.max(jnp.abs(u.astype(jnp.float32) - v.astype(jnp.float32))))
        m = float(jnp.max(jnp.abs(u.astype(jnp.float32))))
        print(json.dumps({"stage": k, "max_abs_diff": round(d, 4),
                          "mag": round(m, 2)}), flush=True)

    _timeit("encoder_native", jn, params, x)
    _timeit("encoder_fused_all", jf, params, x)
    _timeit("encoder_fused_stage1", j1, params, x)

    for fn, name in ((jn, "native"), (jf, "fused_all"), (j1, "fused_s1")):
        c = fn.lower(params, x).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        print(json.dumps({
            "cost": name,
            "gbytes": round(c.get("bytes accessed", 0) / 1e9, 2),
            "gflops": round(c.get("flops", 0) / 1e9, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    sys.exit(run_checks() if mode == "check" else run_tpu())
