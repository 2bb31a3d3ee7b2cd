#!/usr/bin/env python
"""Sequential demo renderer (ref /root/reference/evaluation_cmr_demo.py and
the *_demo loaders): walk a dataset in order, run the model, and write
init/pred/gt projection panels per frame — the frames behind the
reference's demo videos.

Usage:
  python tools/render_demo.py --dataset kd_cmr_snr --root_path /dataset \
      --model_dir log/cmr --out demo_frames [--frames 50]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="kd_cmr_snr",
                    choices=["kd_cmr_snr", "kd_corr_nolidar"])
    ap.add_argument("--network", default="i2pnet")
    ap.add_argument("--root_path", default="/dataset")
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--best", default="model_rotation_best")
    ap.add_argument("--out", default="demo_frames")
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--heat", action="store_true",
                    help="append a pred-vs-gt reprojection-error heat panel")
    ap.add_argument("--video", default=None,
                    help="also stitch frames into this mp4/gif")
    ap.add_argument("--fps", type=int, default=10)
    args = ap.parse_args()

    from i2pnet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax
    import jax.numpy as jnp

    import evaluate as eval_cli
    from i2pnet_tpu import metrics as M
    from i2pnet_tpu.eval.visualize import render_comparison, save_image

    # reuse evaluate.py's builders for model/dataset/checkpoint
    eval_args = eval_cli.parse_args(
        [
            "--dataset", args.dataset, "--network", args.network,
            "--root_path", args.root_path, "--model_dir", args.model_dir,
            "--best", args.best, "--seed", str(args.seed),
        ]
        + (["--tiny"] if args.tiny else [])
    )
    import argparse as _ap

    import train as train_cli

    build_args = _ap.Namespace(**vars(eval_args), max_epoch=0)
    model, cfg, proj, _, _ = train_cli.build(build_args)

    # dataset + params (mirror evaluate.py's test-split construction)
    ds_args = dict(mode="test", seed=args.seed)
    if args.tiny:
        # per-dataset point budget, matching evaluate.py's convention
        sp = (getattr(cfg, "lidar_in_points", 2048)
              if args.dataset == "kd_cmr_snr" else 2048)
        ds_args.update(img_H=64, img_W=128, sample_point=sp)
    from i2pnet_tpu.data import KittiLargeRangeDataset, KittiOdometryCMRDataset

    if args.dataset == "kd_cmr_snr":
        test_ds = KittiOdometryCMRDataset(args.root_path, **ds_args)
    else:
        test_ds = KittiLargeRangeDataset(args.root_path, **ds_args)

    s = test_ds[0]
    rgb = jnp.asarray(s["rgb"])[None]
    lidar = jnp.asarray(s["lidar"])[None]
    intr = jnp.asarray(s["init_intrinsic"])[None]
    raw = jnp.asarray(s["raw_point_xyz"])[None]
    feats = jnp.asarray(s["lidar_feats"])[None]
    if proj:
        variables = model.init(
            jax.random.key(0), rgb, lidar, raw, intr,
            lidar_feature=feats, train=False,
        )
    else:
        variables = model.init(
            jax.random.key(0), rgb, lidar, intr,
            lidar_feature=feats, raw_xyz=raw, train=False,
        )
    # the template fetch above consumed dataset RNG draws — reset so frame
    # draws match a fresh-seeded run
    if hasattr(test_ds, "rng"):
        test_ds.rng = np.random.default_rng(args.seed)
    from i2pnet_tpu.train.checkpoint import restore_inference_variables

    params, bstats = restore_inference_variables(
        args.model_dir, model, variables, best=args.best
    )

    def fwd(rgb, lidar, raw, intr, feats):
        v = {"params": params, "batch_stats": bstats}
        if proj:
            return model.apply(
                v, rgb, lidar, raw, intr, lidar_feature=feats, train=False
            )["out3"]
        return model.apply(
            v, rgb, lidar, intr, lidar_feature=feats, raw_xyz=raw, train=False
        )["out3"]

    fwd = jax.jit(fwd)
    os.makedirs(args.out, exist_ok=True)
    frames = []
    for i in range(min(args.frames, len(test_ds))):
        s = test_ds[i]
        out3 = np.asarray(
            fwd(
                jnp.asarray(s["rgb"])[None],
                jnp.asarray(s["lidar"])[None],
                jnp.asarray(s["raw_point_xyz"])[None],
                jnp.asarray(s["init_intrinsic"])[None],
                jnp.asarray(s["lidar_feats"])[None],
            )
        )
        # project the decalibrated cloud through identity (= initial pose),
        # the predicted correction, and the gt correction
        rgb_u8 = np.clip(s["rgb"], 0, 255).astype(np.uint8)
        pred_E = _decalib_E(out3[0])
        gt_E = _decalib_E(
            np.concatenate([s["decalib_real_gt"], s["decalib_dual_gt"]])
        )
        panel = render_comparison(
            rgb_u8,
            s["lidar"],
            np.eye(3, 4, dtype=np.float32),
            pred_E,
            gt_E,
            s["init_intrinsic"],
        )
        if args.heat:
            from i2pnet_tpu.eval.visualize import render_error_heat

            heat = render_error_heat(
                rgb_u8, s["lidar"], pred_E, gt_E, s["init_intrinsic"]
            )
            panel = np.concatenate([panel, heat], axis=0)
        save_image(os.path.join(args.out, f"frame_{i:06d}.png"), panel)
        if args.video:
            frames.append(panel)
    print(f"wrote {min(args.frames, len(test_ds))} frames to {args.out}")
    if args.video and frames:
        from i2pnet_tpu.eval.visualize import write_video

        written = write_video(args.video, frames, fps=args.fps)
        print(f"wrote video {written}")


def _decalib_E(qt7: np.ndarray) -> np.ndarray:
    from i2pnet_tpu import metrics as M

    R = M.quat_to_rotmat_batch(qt7[None, :4])[0]
    return np.concatenate([R, qt7[4:].reshape(3, 1)], axis=1).astype(np.float32)


if __name__ == "__main__":
    main()
