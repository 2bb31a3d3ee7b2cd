#!/usr/bin/env python
"""Quantify the metric cost of approx_min_k KNN vs exact top_k on TPU.

Trains the free-point model briefly on geometrically consistent synthetic
data (same generator as tools/synthetic_convergence.py), then evaluates the
SAME weights on the SAME held-out batches twice — once with the TPU-default
approx_min_k KNN (recall_target in ops/pointops.py) and once with exact
lax.top_k — and reports ΔRRE/ΔRTE. This validates the "RTE/RRE within 1%"
claim for the approximation (reference KNN is exact dense topk,
ref pointnet_util.py:112-123).

Usage: python tools/knn_accuracy_eval.py [--steps 300] [--eval_batches 4]
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval_batches", type=int, default=4)
    ap.add_argument("--img_h", type=int, default=160)
    ap.add_argument("--img_w", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon_r2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    from i2pnet_tpu import metrics as M
    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from i2pnet_tpu.train import create_train_state, make_train_step
    from tools.synthetic_convergence import make_batch

    cfg = dataclasses.replace(I2PNetConfig(), compute_dtype="bfloat16")
    model = I2PNet(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, args.batch, args.img_h, args.img_w)
    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        train=False,
    )
    state = create_train_state(model, variables, lr=1e-3, steps_per_epoch=1000)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))

    print(f"training {args.steps} steps (approx KNN, TPU default)...", flush=True)
    t0 = time.time()
    for i in range(1, args.steps + 1):
        if i % 10 == 1:
            batch = make_batch(rng, cfg, args.batch, args.img_h, args.img_w)
        state, m = step(state, batch, jax.random.key(i))
    print(f"trained in {time.time()-t0:.0f} s, final loss "
          f"{float(m['loss']):.3f}", flush=True)

    eval_batches = [
        make_batch(rng, cfg, args.batch, args.img_h, args.img_w)
        for _ in range(args.eval_batches)
    ]
    init_E = np.tile(np.eye(3, 4, dtype=np.float32)[None], (args.batch, 1, 1))

    results = {}
    for mode in ("approx", "exact"):
        os.environ["I2PNET_KNN_MODE"] = mode

        def _fwd(s, b):
            v = {"params": s.params, "batch_stats": s.batch_stats}
            return model.apply(
                v, b["rgb"], b["lidar"], b["intrinsic"], train=False
            )["out3"]

        fwd = jax.jit(_fwd)
        rres, rtes = [], []
        t0 = time.time()
        for b in eval_batches:
            out3 = np.asarray(fwd(state, b))
            pred_E, gt_E = M.get_extrinsic(
                out3,
                np.asarray(b["decalib_q_gt"]),
                np.asarray(b["decalib_t_gt"]),
                init_E,
            )
            rre, rte = M.rte_rre(pred_E, gt_E)
            rres.append(rre)
            rtes.append(rte)
        results[mode] = (np.concatenate(rres).mean(), np.concatenate(rtes).mean())
        print(f"{mode:6s}: RRE {results[mode][0]:.4f} deg, "
              f"RTE {results[mode][1]:.4f} m ({time.time()-t0:.0f} s)", flush=True)
    os.environ.pop("I2PNET_KNN_MODE", None)

    d_rre = results["approx"][0] - results["exact"][0]
    d_rte = results["approx"][1] - results["exact"][1]
    p_rre = 100 * d_rre / max(results["exact"][0], 1e-9)
    p_rte = 100 * d_rte / max(results["exact"][1], 1e-9)
    print(
        f"approx-KNN cost: ΔRRE {d_rre:+.4f} deg ({p_rre:+.2f}%), "
        f"ΔRTE {d_rte:+.4f} m ({p_rte:+.2f}%)",
        flush=True,
    )


if __name__ == "__main__":
    main()
