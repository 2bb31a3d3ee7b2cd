#!/usr/bin/env python
"""Training CLI (ref /root/reference/train20v2learn_wandb.py:24-51 FLAGS and
train20v2learn_wandb_proj.py).

Examples:
  python train.py --dataset kd_cmr_snr --network i2pnet --log_dir log/cmr
  python train.py --dataset kd_corr_nolidar --network i2pnet_proj \
      --log_dir log/proj --batch_size 8
"""

from __future__ import annotations

import argparse
import dataclasses


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="kd_cmr_snr",
                   choices=["kitti", "kd_cmr_snr", "nus_cmr_snr",
                            "kd_corr_nolidar", "nus_corr_nolidar"])
    p.add_argument("--network", default="i2pnet",
                   choices=["i2pnet", "i2pnet_proj", "i2pnet_proj_iter"])
    p.add_argument("--root_path", default="/dataset")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--max_epoch", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--save_rate", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--clip", type=float, default=-1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatches per optimizer step")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config (smoke testing)")
    p.add_argument("--debug_nans", action="store_true",
                   help="jax_debug_nans: fail fast on the first NaN "
                        "(the TPU analog of the reference's deterministic/"
                        "launch-blocking debug flags)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv/dense compute dtype (params stay f32)")
    p.add_argument("--color_augment", action="store_true",
                   help="enable image color jitter on the KITTI loaders "
                        "(the reference's KITTI color augmentation is a "
                        "no-op, so this is an opt-in extra; nuScenes "
                        "loaders always jitter like their reference)")
    p.add_argument("--num_workers", type=int, default=0,
                   help="batch-assembly worker processes (0 = one thread; "
                        "the reference DataLoader default is 8)")
    p.add_argument("--train_target", default="all",
                   choices=["all", "regist", "class"],
                   help="loss composition: registration+mask, registration "
                        "only, or mask-classification only (ref "
                        "train20v2learn_wandb.py --train_target)")
    p.add_argument("--efgh", action="store_true",
                   help="online-calibration EFGH variant: thread a per-"
                        "sample full projection matrix (data['calib']) "
                        "through the free-point model (ref "
                        "train20v2learn_wandb.py:741-745; kitti dataset "
                        "only)")
    return p.parse_args(argv)


def build(args):
    from i2pnet_tpu.config import I2PNetConfig, I2PNetProjConfig
    from i2pnet_tpu.models import I2PNet, I2PNetProj

    proj = args.network.startswith("i2pnet_proj")
    if proj:
        cfg = I2PNetProjConfig.tiny() if args.tiny else I2PNetProjConfig()
        if args.dataset.startswith("nus") and not args.tiny:
            cfg = I2PNetProjConfig.nuscenes()
        if args.network == "i2pnet_proj_iter":
            cfg = dataclasses.replace(cfg, refine_iters=6)
        cfg = dataclasses.replace(cfg, compute_dtype=args.compute_dtype)
        model = I2PNetProj(cfg)
    else:
        cfg = I2PNetConfig.tiny() if args.tiny else I2PNetConfig()
        cfg = dataclasses.replace(cfg, compute_dtype=args.compute_dtype)
        if getattr(args, "efgh", False):
            cfg = dataclasses.replace(cfg, efgh=True)
        model = I2PNet(cfg)
    if getattr(args, "efgh", False) and (proj or args.dataset != "kitti"):
        raise SystemExit("--efgh needs the free-point network and "
                         "--dataset kitti (the online-calibration loader "
                         "is the one that emits data['calib'])")

    from i2pnet_tpu.data import (
        KittiLargeRangeDataset,
        KittiOdometryCMRDataset,
        KittiRawCalibDataset,
        NuScenesCMRDataset,
        NuScenesLargeRangeDataset,
    )
    from i2pnet_tpu.data.params import KITTI_ONLINE_CALIB

    tiny_kw = {}
    if args.tiny:
        tiny_kw = dict(img_H=64, img_W=128)

    if args.dataset == "kd_cmr_snr":
        sp = (
            dict(sample_point=getattr(cfg, "lidar_in_points", 2048))
            if args.tiny else {}
        )
        train_ds = KittiOdometryCMRDataset(
            args.root_path, mode="train", seed=args.seed,
            color_augment=getattr(args, "color_augment", False),
            **tiny_kw, **sp
        )
        valid_ds = None
    elif args.dataset == "kd_corr_nolidar":
        sp = dict(sample_point=2048) if args.tiny else {}
        train_ds = KittiLargeRangeDataset(
            args.root_path, mode="train", seed=args.seed,
            color_augment=getattr(args, "color_augment", False),
            **tiny_kw, **sp
        )
        valid_ds = KittiLargeRangeDataset(
            args.root_path, mode="val", seed=args.seed, **tiny_kw, **sp
        )
    elif args.dataset == "kitti":
        pp = dict(KITTI_ONLINE_CALIB["train"])
        pp["base_path"] = args.root_path
        sp = {}
        if args.tiny:
            # smoke-test geometry: /32-clean image, config-matched points
            pp.update(resize_w=128, resize_h=64)
            sp = dict(sample_point=cfg.lidar_in_points)
        train_ds = KittiRawCalibDataset(
            pp["base_path"], pp["date"], pp["drives"], d_rot=pp["d_rot"],
            d_trans=pp["d_trans"], fixed_decalib=pp["fixed_decalib"],
            resize_w=pp["resize_w"], resize_h=pp["resize_h"], seed=args.seed,
            emit_calib=getattr(args, "efgh", False), **sp,
        )
        valid_ds = None
    elif args.dataset == "nus_cmr_snr":
        import glob as _g

        splits = sorted(_g.glob(f"{args.root_path}/train_dataset*.list"))
        train_ds = NuScenesCMRDataset(args.root_path, splits, mode="train", seed=args.seed)
        valid_ds = None
    else:  # nus_corr_nolidar
        import glob as _g

        splits = sorted(_g.glob(f"{args.root_path}/train_dataset*.list"))
        train_ds = NuScenesLargeRangeDataset(args.root_path, splits, mode="train", seed=args.seed)
        valid_ds = None
    return model, cfg, proj, train_ds, valid_ds


def main(argv=None):
    args = parse_args(argv)
    from i2pnet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    # multi-host: wires the coordination service when the env configures it
    # (JAX_COORDINATOR_ADDRESS / cloud-TPU); no-op on this single-host box
    from i2pnet_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    from i2pnet_tpu.train.trainer import Trainer
    from i2pnet_tpu.utils.seeding import set_seed

    set_seed(args.seed)
    model, cfg, proj, train_ds, valid_ds = build(args)
    trainer = Trainer(
        model,
        cfg,
        train_ds,
        valid_ds,
        log_dir=args.log_dir,
        batch_size=args.batch_size,
        lr=args.lr,
        weight_decay=args.weight_decay,
        clip=args.clip,
        epochs=args.max_epoch,
        seed=args.seed,
        proj=proj,
        save_rate=args.save_rate,
        resume=args.resume,
        accum_steps=args.accum_steps,
        run_flags=vars(args),
        train_target=args.train_target,
        num_workers=args.num_workers,
    )
    trainer.train()


if __name__ == "__main__":
    main()
