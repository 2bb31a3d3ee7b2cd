"""A/B the RGB-encoder remat + bf16-BN levers inside the FULL jitted
free-point train step at production shapes (B=8, 384x1280, N=8192,
compute_dtype=bfloat16) on the real TPU.

Round-2 located the train step's cost in the RGB encoder's backward HBM
traffic (BASELINE.md:52-87); this measures the two traffic levers the
round-2 wrap-up named but did not try:
  * encoder_remat            — save only conv outputs, recompute BN/
                               LeakyReLU/pool chains in the backward
  * encoder_bn_compute_dtype — apply BN in bf16 (stats stay f32)

Per CLAUDE.md: timed by pulling a scalar (block_until_ready does not block
over the axon tunnel) and always inside the full step, never as a
standalone op microbenchmark.
"""

from __future__ import annotations

import dataclasses
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

from i2pnet_tpu.config import I2PNetConfig
from i2pnet_tpu.models import I2PNet
from i2pnet_tpu.train import create_train_state, make_train_step

BATCH = 8
IMG_H, IMG_W = 384, 1280


def sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def make_batch(cfg):
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(BATCH, IMG_H, IMG_W, 3)).astype(np.float32))
    lidar = jnp.asarray(
        rng.uniform(-10, 10, size=(BATCH, cfg.lidar_in_points, 3)).astype(np.float32)
    ).at[..., 2].add(20.0)
    intrinsic = jnp.tile(
        jnp.asarray(
            [[[718.0, 0, IMG_W / 2], [0, 718.0, IMG_H / 2], [0, 0, 1]]], jnp.float32
        ),
        (BATCH, 1, 1),
    )
    return {
        "rgb": rgb,
        "lidar": lidar,
        "intrinsic": intrinsic,
        "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (BATCH, 1)),
        "decalib_t_gt": jnp.zeros((BATCH, 3)),
    }


def bench_variant(name, iters=10, env=None, **cfg_kw):
    for k, v in (env or {}).items():
        os.environ[k] = v  # read at trace time by max_pool_3x3
    cfg = dataclasses.replace(
        I2PNetConfig(), compute_dtype="bfloat16", **cfg_kw
    )
    model = I2PNet(cfg)
    batch = make_batch(cfg)
    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        train=False,
    )
    state = create_train_state(model, variables, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.key(0))
    sync(m["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.key(i))
    sync(m["loss"])
    dt = time.perf_counter() - t0
    ms = dt / iters * 1e3
    out = {
        "variant": name,
        "step_ms": round(ms, 1),
        "pairs_per_sec": round(BATCH * iters / dt, 1),
        "loss0": float(m["loss"]),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(out), flush=True)
    for k in (env or {}):
        os.environ.pop(k, None)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="r2,remat,bn,remat_bn",
                    help="comma list: r2,remat,bn,remat_bn,bn_allties,"
                         "fused,pool_spmd,pool_idx,pool_pallas,"
                         "pool_native,pool_sas")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}", flush=True)
    it = args.iters
    v = set(args.variants.split(","))
    if "r2" in v:
        bench_variant("r2_default", iters=it, encoder_bn_compute_dtype=False)
    if "remat" in v:
        bench_variant("remat", iters=it, encoder_remat=True,
                      encoder_bn_compute_dtype=False)
    if "bn" in v:
        bench_variant("bf16_bn", iters=it, encoder_bn_compute_dtype=True)
    if "remat_bn" in v:
        bench_variant("remat+bf16_bn", iters=it, encoder_remat=True,
                      encoder_bn_compute_dtype=True)
    if "bn_allties" in v:
        bench_variant("bf16_bn+allties", iters=it,
                      encoder_bn_compute_dtype=True,
                      env={"I2PNET_POOL_ALLTIES": "1"})
    if "fused" in v:
        # merged-layout Pallas conv+BN+pool train path (conv_pallas_train)
        bench_variant("fused_train", iters=it,
                      env={"I2PNET_FUSED_TRAIN": "1"})
    if "pool_spmd" in v:
        # stride-1 pool backward rerouted to the pure-shift argtap
        # formulation (cfg.spatial_parallel / GSPMD workaround) — measures
        # what spatial-parallel configs pay on a single chip and whether
        # the reroute could be default-on (BASELINE.md round-3c)
        bench_variant("pool_spmd_s1", iters=it,
                      env={"I2PNET_POOL_SPMD_S1": "1"})
    # pool-backward backend A/B inside the fused step (default is the
    # round-4f winner "idx"; the others are the measured-slower
    # verification backends — pallas loses nothing on narrow blocks but
    # cannot cover wide ones, sas was the pre-idx wide default at 86.0)
    for name in ("idx", "pallas", "native", "sas"):
        if f"pool_{name}" in v:
            bench_variant(f"fused+pool_{name}", iters=it,
                          env={"I2PNET_POOL_BWD": name})
    # (round-5 cv_dense/cv_factored respond variants measured: factored
    # lost 67.3 -> 69.8/70.4 ms and was deleted — BASELINE.md round-5)
    # round-5b: PointwiseConv BN application dtype (stats stay f32).
    # pw_bn_f32 is the round-4 behavior (astype(f32) before BN on every
    # (B,N,K,C) tensor); the bf16 application is the new default.
    if "pw_bn_f32" in v:
        bench_variant("pw_bn_f32", iters=it, env={"I2PNET_PW_BN_F32": "1"})
    if "pw_bn_bf16" in v:
        bench_variant("pw_bn_bf16", iters=it)


if __name__ == "__main__":
    main()
