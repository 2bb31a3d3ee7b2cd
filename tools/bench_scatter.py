#!/usr/bin/env python
"""Microbench: native XLA scatter-add vs sort-based scatter_add_rows on TPU.

Times the gather-VJP shapes that dominate the free-point train step's
backward (see tools/profile_backward.py inventory). Forced-completion
timing per CLAUDE.md (block_until_ready does not block over axon).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon_r2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from i2pnet_tpu.ops.scatter import scatter_add_rows

    def sync(x):
        return np.asarray(jax.device_get(x.ravel()[0]))

    def timeit(fn, *args, reps=10):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / reps * 1000

    @jax.jit
    def native(ct, idx, zeros):
        return zeros.at[
            jnp.arange(ct.shape[0])[:, None], idx
        ].add(ct)

    @jax.jit
    def sorted_seg(ct, idx, zeros):
        return scatter_add_rows(ct, idx, zeros.shape[1])

    rng = np.random.default_rng(0)
    # (B, M, C, N): gather-VJP shapes in the free-point step
    shapes = [
        (8, 2048 * 32, 16, 8192),   # l1 SA feature gather
        (8, 1024 * 16, 32, 2048),   # l2 SA
        (8, 256 * 16, 64, 1024),    # l3 SA
        (8, 64 * 16, 128, 256),     # l4 SA
        (8, 256 * 32, 64, 480),     # cost volume 2 image gather
        (8, 256 * 8, 256, 64),      # setupconv l4->l3
        (8, 256 * 4, 128, 256),     # cv 3D grouping
    ]
    print(f"{'B,M,C,N':>24} {'native ms':>10} {'sorted ms':>10} {'speedup':>8}")
    for B, M, C, N in shapes:
        ct = jnp.asarray(rng.normal(size=(B, M, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, size=(B, M)).astype(np.int32))
        zeros = jnp.zeros((B, N, C), jnp.float32)
        # correctness
        a = np.asarray(jax.device_get(native(ct, idx, zeros)))
        b = np.asarray(jax.device_get(sorted_seg(ct, idx, zeros)))
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        t_n = timeit(native, ct, idx, zeros)
        t_s = timeit(sorted_seg, ct, idx, zeros)
        tag = f"({B},{M},{C},{N})"
        print(
            f"{tag:>24} {t_n:10.3f} {t_s:10.3f} {t_n / t_s:7.1f}x  relerr={err:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
