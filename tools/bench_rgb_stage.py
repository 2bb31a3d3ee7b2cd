#!/usr/bin/env python
"""Attribute the RGB-encoder backward cost: grad of stage-1 variants.

Times fwd and grad of the real stage-1 block stack (conv+BN+leaky+pool x5
at 384x1280, B=8, bf16 convs / f32 BN+pool) and ablations that remove one
component at a time. Identifies which op class actually owns the ~71 ms
rgb backward measured by tools/decompose_backward.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon_r2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import flax.linen as nn
    import jax.numpy as jnp

    from i2pnet_tpu.nn.layers import batch_norm, max_pool_3x3

    B = args.batch
    H, W = 384, 1280
    CH = (16, 16, 16, 16, 32)
    ST = (2, 1, 1, 1, 2)

    class Stage(nn.Module):
        use_bn: bool = True
        use_pool: bool = True
        use_leaky: bool = True
        pool_f32: bool = True
        pool_convbwd: bool = False
        bn_bf16: bool = False

        @nn.compact
        def __call__(self, x, train=True):
            for ch, s in zip(CH, ST):
                stride = (1, 1) if self.use_pool else (s, s)
                x = nn.Conv(ch, (3, 3), strides=stride,
                            padding=((1, 1), (1, 1)), dtype=jnp.bfloat16)(x)
                if self.use_bn:
                    if self.bn_bf16:
                        # stats still accumulate f32 inside flax; only the
                        # normalize/scale elementwise math runs bf16
                        x = nn.BatchNorm(
                            use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.bfloat16,
                        )(x)
                    else:
                        x = batch_norm(train)(x.astype(jnp.float32))
                if self.use_leaky:
                    x = nn.leaky_relu(
                        x.astype(jnp.float32) if self.pool_f32 else x, 0.1
                    )
                if not self.pool_f32:
                    x = x.astype(jnp.bfloat16)
                if self.use_pool:
                    if self.pool_convbwd:
                        x = max_pool_3x3(x, s)
                    else:
                        x = nn.max_pool(x, (3, 3), strides=(s, s),
                                        padding=((1, 1), (1, 1)))
            return x

    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))

    def timeit(tag, fn, *a, iters=8):
        t_c = time.perf_counter()
        out = fn(*a)
        sync(out)
        c = time.perf_counter() - t_c
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        sync(out)
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{tag:44s} {ms:8.2f} ms (first {c:5.1f} s)", flush=True)
        return ms

    variants = [
        ("full (conv+bn+leaky+pool, pool f32)", dict()),
        ("pool in bf16", dict(pool_f32=False)),
        ("pool bf16 + bn bf16", dict(pool_f32=False, bn_bf16=True)),
        ("pool bf16 + pallas-routed backward", dict(pool_f32=False,
                                                    pool_convbwd=True)),
        ("no pool (stride via conv)", dict(use_pool=False)),
        ("no bn", dict(use_bn=False)),
        ("conv only", dict(use_bn=False, use_leaky=False, use_pool=False)),
    ]
    for tag, kw in variants:
        m = Stage(**kw)
        v = m.init(jax.random.key(0), rgb, train=False)

        fwd = jax.jit(lambda p, bs, x, _m=m: _m.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"])[0].sum())
        g = jax.jit(lambda p, bs, x, _m=m: jax.grad(
            lambda pp: _m.apply({"params": pp, "batch_stats": bs}, x,
                                train=True, mutable=["batch_stats"])[0]
            .astype(jnp.float32).sum()
        )(p))
        bs = v.get("batch_stats", {})
        f = timeit(f"fwd  {tag}", fwd, v["params"], bs, rgb)
        gm = timeit(f"grad {tag}", g, v["params"], bs, rgb)
        print(f"     -> backward share {gm - f:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
