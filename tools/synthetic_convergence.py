#!/usr/bin/env python
"""End-to-end learning demo on geometrically consistent synthetic data.

Generates samples where the IMAGE actually encodes the cloud under the
ground-truth pose: points are splatted into a depth-shaded image through the
intrinsic at the gt extrinsic, then the cloud is decalibrated by a random
(q, t). A working registration network must drive RTE/RRE down; random
images could never show that. This is the strongest no-dataset validation
of the full train loop (model + loss + optimizer + metrics) on real TPU.

Usage: python tools/synthetic_convergence.py [--steps 300] [--tiny]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_batch(rng, cfg, B, img_h, img_w, max_deg=10.0, max_t=1.0):
    import jax.numpy as jnp

    from i2pnet_tpu.data import transforms as T

    N = cfg.lidar_in_points
    fx = img_w / 2.0
    K = np.array([[fx, 0, img_w / 2], [0, fx, img_h / 2], [0, 0, 1]], np.float32)

    rgbs, lidars, qs, ts = [], [], [], []
    for _ in range(B):
        # cloud in front of the camera
        pts = np.zeros((N, 3), np.float32)
        pts[:, 0] = rng.uniform(-15, 15, N)
        pts[:, 1] = rng.uniform(-3, 3, N)
        pts[:, 2] = rng.uniform(4, 40, N)
        # depth-splat the gt-pose image (gt extrinsic == identity)
        img = np.zeros((img_h, img_w, 3), np.float32)
        uvw = pts @ K.T
        uv = (uvw[:, :2] / uvw[:, 2:3]).astype(np.int64)
        m = (
            (uv[:, 0] >= 0) & (uv[:, 0] < img_w)
            & (uv[:, 1] >= 0) & (uv[:, 1] < img_h)
        )
        shade = np.clip(255 * (1 - (pts[:, 2] - 4) / 36), 0, 255)
        img[uv[m, 1], uv[m, 0]] = shade[m, None]

        Pr = T.generate_random_transform(
            rng, max_t, max_t, max_t,
            np.deg2rad(max_deg), np.deg2rad(max_deg), np.deg2rad(max_deg),
        )
        q, t = T.decalib_ground_truth(Pr[:3, :])
        # decalibrated cloud: Pr^-1 @ p, so that applying (q, t) restores p
        Pr_inv = np.linalg.inv(Pr)
        lidar = pts @ Pr_inv[:3, :3].T + Pr_inv[:3, 3]

        rgbs.append(img)
        lidars.append(lidar.astype(np.float32))
        qs.append(q)
        ts.append(t)

    import jax

    return {
        "rgb": jnp.asarray(np.stack(rgbs)),
        "lidar": jnp.asarray(np.stack(lidars)),
        "intrinsic": jnp.asarray(np.tile(K[None], (B, 1, 1))),
        "decalib_q_gt": jnp.asarray(np.stack(qs)),
        "decalib_t_gt": jnp.asarray(np.stack(ts)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--proj", action="store_true",
                    help="projection model (large-range protocol shapes)")
    ap.add_argument("--img_h", type=int, default=160)
    ap.add_argument("--img_w", type=int, default=512)
    ap.add_argument("--report_every", type=int, default=50)
    ap.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                    help="override conv/MLP compute dtype (default: bf16 for "
                    "the full free-point config, f32 otherwise)")
    args = ap.parse_args()

    from i2pnet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import dataclasses

    import jax

    from i2pnet_tpu import metrics as M
    from i2pnet_tpu.config import I2PNetConfig, I2PNetProjConfig
    from i2pnet_tpu.models import I2PNet, I2PNetProj
    from i2pnet_tpu.train import (
        create_train_state,
        make_train_step,
        make_train_step_proj,
    )

    if args.proj:
        cfg = I2PNetProjConfig.tiny() if args.tiny else I2PNetProjConfig()
        # synthetic clouds are dense everywhere; loosen the lv1 radius so
        # windows find neighbors (KITTI's 0.75 m assumes real scan density)
        cfg = dataclasses.replace(cfg, down_conv_dis=(3.0,) + cfg.down_conv_dis[1:])
        if args.dtype is not None:
            cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
        model = I2PNetProj(cfg)
        # config object for the point budget used by make_batch
        cfg_pts = dataclasses.replace(
            I2PNetConfig(), lidar_in_points=20000 if not args.tiny else 2048
        )
    else:
        cfg = I2PNetConfig.tiny() if args.tiny else I2PNetConfig()
        if not args.tiny:
            cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
        if args.dtype is not None:
            cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
        model = I2PNet(cfg)
        cfg_pts = cfg

    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg_pts, args.batch, args.img_h, args.img_w)
    if args.proj:
        batch["raw_xyz"] = batch["lidar"]  # raw frame == decalibrated frame
        variables = model.init(
            jax.random.key(0), batch["rgb"], batch["lidar"], batch["raw_xyz"],
            batch["intrinsic"], train=False,
        )
        step_fn = make_train_step_proj(model, cfg)
    else:
        variables = model.init(
            jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
            train=False,
        )
        step_fn = make_train_step(model, cfg)
    state = create_train_state(model, variables, lr=1e-3, steps_per_epoch=1000)
    step = jax.jit(step_fn, donate_argnums=(0,))

    def _fwd(s, b):
        v = {"params": s.params, "batch_stats": s.batch_stats}
        if args.proj:
            return model.apply(
                v, b["rgb"], b["lidar"], b["raw_xyz"], b["intrinsic"], train=False
            )["out3"]
        return model.apply(v, b["rgb"], b["lidar"], b["intrinsic"], train=False)["out3"]

    fwd = jax.jit(_fwd)

    eval_batch = make_batch(rng, cfg_pts, args.batch, args.img_h, args.img_w)
    if args.proj:
        eval_batch["raw_xyz"] = eval_batch["lidar"]
    init_E = np.tile(np.eye(3, 4, dtype=np.float32)[None], (args.batch, 1, 1))

    def report(tag):
        out3 = np.asarray(fwd(state, eval_batch))
        pred_E, gt_E = M.get_extrinsic(
            out3,
            np.asarray(eval_batch["decalib_q_gt"]),
            np.asarray(eval_batch["decalib_t_gt"]),
            init_E,
        )
        rre, rte = M.rte_rre(pred_E, gt_E)
        print(f"{tag}: RRE {rre.mean():.2f} deg, RTE {rte.mean():.3f} m", flush=True)
        return rre.mean(), rte.mean()

    rre0, rte0 = report("step 0 (random init)")
    t0 = time.time()
    for i in range(1, args.steps + 1):
        if i % 10 == 1:  # fresh decalibrations, same scene distribution
            batch = make_batch(rng, cfg_pts, args.batch, args.img_h, args.img_w)
            if args.proj:
                batch["raw_xyz"] = batch["lidar"]
        state, m = step(state, batch, jax.random.key(i))
        if i % args.report_every == 0:
            report(f"step {i} (loss {float(m['loss']):.3f})")
    rre1, rte1 = report(f"final (train time {time.time()-t0:.0f}s)")
    assert rre1 < rre0 and rte1 < rte0, "no improvement — learning is broken"
    print("CONVERGENCE OK: RRE %.2f->%.2f deg, RTE %.3f->%.3f m"
          % (rre0, rre1, rte0, rte1), flush=True)


if __name__ == "__main__":
    main()
