"""KITTI odometry small-range dataset (CMRNet protocol).

Mirrors ref src/kitti_odometry_cmr.py Kitti_Odometry_Dataset: per-frame h5
local maps, +-10 deg / +-2 m decalibrations (random at train, fixed table at
test/val), top-50-row crop + resize to (img_H, img_W), 8192-point sampling
with repetition padding.

Sample-dict keys match the reference (ref :592-608) with channels-last
images. The decalibrated cloud satisfies: warp(lidar, q_gt, t_gt) == Pc @ p.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from i2pnet_tpu.data import transforms as T
from i2pnet_tpu.data.calib import camera_matrix_cropping, read_calib

TRAIN_SEQS = (3, 5, 6, 7, 8, 9)  # ref :66-74
TEST_SEQS = (0,)


class KittiOdometryCMRDataset:
    """Index over (seq, frame) with h5 local maps.

    Expected layout under root_path (ref :414-440):
      kitti_processed_CMRNet/sequences/%02d/local_maps/%06d.h5 (PC (4,N),
      intensity (1,N)), .../image_2_npy/%06d.npy, .../calib.txt,
      and a test_RT csv/pkl per protocol for fixed decalibrations.
    """

    def __init__(
        self,
        root_path: str,
        mode: str = "train",
        img_H: int = 384,
        img_W: int = 1280,
        sample_point: int = 8192,
        max_r: float = 10.0,
        max_t: float = 2.0,
        seqs: Optional[Sequence[int]] = None,
        test_rt: Optional[np.ndarray] = None,
        seed: int = 0,
        use_raw: bool = True,
        augment: bool = True,
        color_augment: bool = False,
    ):
        self.root_path = root_path
        self.mode = mode
        self.img_H, self.img_W = img_H, img_W
        self.sample_point = sample_point
        self.rx = self.ry = self.rz = max_r * np.pi / 180.0
        self.tx = self.ty = self.tz = max_t
        self.use_raw = use_raw
        # augment = the reference's ACTUAL train augmentation (pc jitter,
        # ref :522); color_augment defaults OFF because the reference's
        # augment_img is a documented no-op (ColorJitter() without ranges,
        # ref :374-389) — enabling it is an opt-in extra
        self.augment = augment
        self.color_augment = color_augment
        self.rng = np.random.default_rng(seed)

        if seqs is None:
            seqs = TRAIN_SEQS if mode == "train" else TEST_SEQS
        self.dataset: List[Tuple] = []
        for seq in seqs:
            seq_dir = os.path.join(
                root_path, "kitti_processed_CMRNet", "sequences", "%02d" % seq
            )
            pc_folder = os.path.join(seq_dir, "local_maps")
            img_folder = os.path.join(seq_dir, "image_2_npy")
            calib_path = os.path.join(seq_dir, "calib.txt")
            if not os.path.isdir(pc_folder):
                continue
            frames = sorted(
                int(f.split(".")[0]) for f in os.listdir(pc_folder) if f.endswith(".h5")
            )
            for fi in frames:
                self.dataset.append((pc_folder, img_folder, calib_path, seq, fi))

        # fixed decalibration table for test/val (ref :255-283); default to
        # a deterministic generated table so the dataset works standalone
        self.test_RT = test_rt
        if mode != "train":
            if self.test_RT is None:
                from i2pnet_tpu.data.preprocess import generate_test_rt

                n_rt = 1 + max(fi for *_, fi in self.dataset) if self.dataset else 0
                self.test_RT = generate_test_rt(
                    n_rt, max_r_deg=max_r, max_t=max_t, seed=seed
                )
            max_fi = max((fi for *_, fi in self.dataset), default=-1)
            assert len(self.test_RT) > max_fi, (
                f"test RT table too short: {len(self.test_RT)} rows, need "
                f"frame id up to {max_fi} (table is keyed by per-sequence "
                "frame id, ref :473)"
            )

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int) -> dict:
        import h5py

        pc_folder, img_folder, calib_path, seq, seq_i = self.dataset[index]
        Tr, cam_intrinsic, P2 = read_calib(calib_path)
        Tr = np.vstack((Tr, [0, 0, 0, 1]))
        Pc = P2 @ Tr

        with h5py.File(os.path.join(pc_folder, "%06d.h5" % seq_i), "r") as hf:
            pc_np = np.asarray(hf["PC"], np.float32)[:3]  # (3,N)
            intensity_np = np.asarray(hf["intensity"], np.float32)

        origin_pc_np = pc_np.copy().T.astype(np.float32)

        # decalibration (ref :460-497)
        if self.mode == "train":
            Pr = T.generate_random_transform(
                self.rng, self.tx, self.ty, self.tz, self.rx, self.ry, self.rz
            )
        else:
            # keyed by the PER-SEQUENCE frame id, not the dataset index
            # (ref :473 self.test_RT[seq_i]) — they differ when frames are
            # non-contiguous or multiple sequences are evaluated
            rx, ry, rz, tx, ty, tz = self.test_RT[seq_i]
            Pr = T.generate_transformation(rx, ry, rz, tx, ty, tz)
        Pr_inv = np.linalg.inv(Pr)
        decalib_q, decalib_t = T.decalib_ground_truth(Pr[:3, :])
        init_extrinsic = (Pr_inv @ Pc)[:3, :]

        # image (ref :499-516)
        rgb_img = np.load(os.path.join(img_folder, "%06d.npy" % seq_i))
        crop_top = 50
        rgb_img = rgb_img[crop_top:, :, :]
        intrinsic = camera_matrix_cropping(cam_intrinsic, dx=0, dy=crop_top)
        h, w = rgb_img.shape[:2]
        rgb_img = T.resize_image(rgb_img, self.img_W, self.img_H)
        intrinsic[0, 0] *= self.img_W / w
        intrinsic[0, 2] *= self.img_W / w
        intrinsic[1, 1] *= self.img_H / h
        intrinsic[1, 2] *= self.img_H / h

        if self.mode == "train" and self.augment:
            pc_np = T.jitter_point_cloud(self.rng, pc_np)
        if self.mode == "train" and self.color_augment:
            rgb_img = T.color_jitter(self.rng, rgb_img)

        # point sampling (ref :527-541)
        sel = T.sample_points_with_repetition(
            self.rng, pc_np.shape[1], self.sample_point
        )
        pc_np = pc_np[:, sel]
        intensity_np = intensity_np[:, sel]
        origin_pc_np = origin_pc_np[sel, :]

        pc_h = np.concatenate([pc_np, np.ones((1, pc_np.shape[1]))], axis=0)
        pc_cam = (Pc[:3, :] @ pc_h).T.astype(np.float32)
        lidar_img = (init_extrinsic @ pc_h).T.astype(np.float32)

        rgb = T.normalize_image(rgb_img)  # HWC float (0..255, ref normal=False)

        return {
            "rgb": rgb,
            "decalib_real_gt": decalib_q,
            "decalib_dual_gt": decalib_t,
            "init_extrinsic": init_extrinsic.astype(np.float32),
            "init_intrinsic": intrinsic.astype(np.float32),
            "raw_intrinsic": cam_intrinsic.astype(np.float32),
            "lidar": lidar_img,
            "resize_img": np.array([self.img_H, self.img_W], np.float32),
            "index": index,
            "path_info": "%02d %06d %06d" % (seq, seq_i, seq_i),
            "lidar_feats": lidar_img,  # ref :555 lidar_feats = xyz itself
            "raw_point_xyz": origin_pc_np
            if self.use_raw
            else np.zeros_like(lidar_img),
            "pc_cam": pc_cam,
        }
