"""KITTI raw online-calibration dataset (ref /root/reference/src/dataset.py
Kitti_Dataset + src/calib.py constants).

Raw-drive images + velodyne bins; decalibration sampled per item
(+-d_rot deg euler zyx, +-d_trans m; fixed at the amplitude when
fixed_decalib). init_extrinsic = decalib @ velo_extrinsic; the regression
target is inverse(decalib). Images resized to (resize_h, resize_w) and
ImageNet-normalized (this loader, unlike the odometry ones, normalizes —
ref dataset.py:360-362).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np
from scipy.spatial.transform import Rotation

from i2pnet_tpu.data import transforms as T

# velo -> cam2 parameters with R0_rect folded in (ref src/calib.py:20-64)
CALIB_BY_DATE = {
    "2011_09_26": dict(
        fx=7.215377e02, fy=7.215377e02, cx=6.095593e02, cy=1.728540e02,
        rot=[
            [2.34773698e-04, -9.99944155e-01, -1.05634778e-02],
            [1.04494074e-02, 1.05653536e-02, -9.99889574e-01],
            [9.99945389e-01, 1.24365378e-04, 1.04513030e-02],
        ],
        trans=[[5.93721868e-02], [-7.48089053e-02], [-2.69386912e-01]],
    ),
    "2011_09_30": dict(
        fx=7.070912e02, fy=7.070912e02, cx=6.018873e02, cy=1.831104e02,
        rot=[
            [-0.00185774, -0.99996595, -0.00803998],
            [-0.00648147, 0.00805186, -0.99994661],
            [0.99997731, -0.00180553, -0.0064962],
        ],
        trans=[[0.06152684], [-0.07320761], [-0.32779358]],
    ),
}


def euler_to_rotmat(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """rot_z(yaw) @ rot_y(pitch) @ rot_x(roll) (ref src/utils.py:216-232)."""
    return Rotation.from_euler("zyx", [yaw, pitch, roll]).as_matrix()


class KittiRawCalibDataset:
    def __init__(
        self,
        base_path: str,
        date: str,
        drives,
        d_rot: float = 10.0,
        d_trans: float = 1.0,
        fixed_decalib: bool = False,
        resize_w: int = 1216,
        resize_h: int = 352,
        sample_point: int = 8192,
        seed: int = 0,
        pc_filter: bool = True,
        emit_calib: bool = False,
    ):
        """emit_calib: additionally emit a per-sample 'calib' (3, 4)
        projection matrix (resized K @ [I|0]) for the efgh model variant.
        The reference's own efgh dataset files (kitti_odometry_efgh*,
        imported by evaluation.py:123-127) are absent from its snapshot;
        this reproduces the efgh INTERFACE — a full projection matrix
        threaded per sample (ref train20v2learn_wandb.py:741-745) — with
        camera-frame anchoring so the decalibration ground truth keeps its
        reference semantics."""
        self.d_rot = d_rot
        self.d_trans = d_trans
        self.fixed_decalib = fixed_decalib
        self.resize_w, self.resize_h = resize_w, resize_h
        self.sample_point = sample_point
        self.pc_filter = pc_filter
        self.emit_calib = emit_calib
        self.rng = np.random.default_rng(seed)

        self.img_path, self.lidar_path = [], []
        for drive in drives:
            drive_dir = os.path.join(
                base_path, date, f"{date}_drive_{drive:04d}_sync"
            )
            d_imgs = sorted(
                glob.glob(os.path.join(drive_dir, "image_02", "data", "*.png"))
            )
            d_lidars = sorted(
                glob.glob(
                    os.path.join(drive_dir, "velodyne_points", "data", "*.bin")
                )
            )
            # pairing is positional — a dropped frame in either modality
            # would silently misalign every later (image, scan) pair
            if len(d_imgs) != len(d_lidars):
                raise ValueError(
                    f"{drive_dir}: {len(d_imgs)} images vs {len(d_lidars)} "
                    "scans — cannot pair positionally"
                )
            self.img_path.extend(d_imgs)
            self.lidar_path.extend(d_lidars)

        params = CALIB_BY_DATE[date]
        self.cam_intrinsic = np.array(
            [[params["fx"], 0, params["cx"]], [0, params["fy"], params["cy"]], [0, 0, 1]]
        )
        self.velo_extrinsic = np.hstack(
            [np.asarray(params["rot"]), np.asarray(params["trans"])]
        )

    def __len__(self) -> int:
        return len(self.img_path)

    def get_decalibration(self, index: Optional[int] = None):
        """ref dataset.py:258-286. index is unused here; subclasses with
        fixed per-sample decalib tables key on it."""
        if self.fixed_decalib:
            vals = [np.deg2rad(self.d_rot)] * 3 + [self.d_trans] * 3
        else:
            u = lambda: self.rng.random() * 2 - 1
            vals = [
                u() * np.deg2rad(self.d_rot),
                u() * np.deg2rad(self.d_rot),
                u() * np.deg2rad(self.d_rot),
                u() * self.d_trans,
                u() * self.d_trans,
                u() * self.d_trans,
            ]
        rot = euler_to_rotmat(vals[0], vals[1], vals[2])
        trans = np.asarray(vals[3:]).reshape(3, 1)
        return np.hstack([rot, trans])

    def __getitem__(self, index: int) -> dict:
        import cv2

        rgb_img = cv2.imread(self.img_path[index])[:, :, ::-1]
        rgb_img = np.ascontiguousarray(rgb_img)

        decalib_extrinsic = self.get_decalibration(index)
        calib_extrinsic = np.linalg.pinv(
            np.vstack([decalib_extrinsic, [0, 0, 0, 1]])
        )[:3, :]
        decalib_q, decalib_t = T.decalib_ground_truth(calib_extrinsic)
        init_extrinsic = (
            np.vstack([decalib_extrinsic, [0, 0, 0, 1]])
            @ np.vstack([self.velo_extrinsic, [0, 0, 0, 1]])
        )[:3, :]

        h, w = rgb_img.shape[:2]
        scale = np.array([self.resize_w / w, self.resize_h / h])
        intrinsic = self.cam_intrinsic.copy()
        intrinsic[0, 0] *= scale[0]
        intrinsic[0, 2] *= scale[0]
        intrinsic[1, 1] *= scale[1]
        intrinsic[1, 2] *= scale[1]

        # points: filter then transform then sample without repeat
        # (ref dataset.py:185-212)
        pcl = np.fromfile(self.lidar_path[index], dtype=np.float32).reshape(-1, 4)
        pcl_xyz = pcl[:, :3]
        if self.pc_filter:
            not_ground = pcl_xyz[:, 2] >= -15
            near = (
                (pcl_xyz[:, 0] > 2)
                & (pcl_xyz[:, 0] < 1200)
                & (np.abs(pcl_xyz[:, 1]) < 1200)
            )
            pcl_xyz = pcl_xyz[not_ground & near]
        pc_h = np.hstack([pcl_xyz, np.ones((pcl_xyz.shape[0], 1))]).T
        cam_pts = (init_extrinsic @ pc_h).T.astype(np.float32)
        sel = self.rng.permutation(cam_pts.shape[0])[: self.sample_point]
        if len(sel) < self.sample_point:
            sel = T.sample_points_with_repetition(
                self.rng, cam_pts.shape[0], self.sample_point
            )
        lidar_img = cam_pts[sel]

        rgb_img = T.resize_image(rgb_img, self.resize_w, self.resize_h)
        rgb = T.normalize_image(rgb_img, imagenet=True)

        out = {
            "rgb": rgb,
            "decalib_real_gt": decalib_q,
            "decalib_dual_gt": decalib_t,
            "init_extrinsic": init_extrinsic.astype(np.float32),
            "init_intrinsic": intrinsic.astype(np.float32),
            "raw_intrinsic": self.cam_intrinsic.astype(np.float32),
            "lidar": lidar_img,
            "lidar_feats": lidar_img,
            "raw_point_xyz": lidar_img,
            "resize_img": scale.astype(np.float32),
            "index": index,
            "path_info": self.lidar_path[index],
        }
        if self.emit_calib:
            out["calib"] = np.hstack(
                [intrinsic, np.zeros((3, 1))]
            ).astype(np.float32)
        return out


class KittiRGGDataset(KittiRawCalibDataset):
    """RGGNet-protocol dataset: raw-KITTI pairs with FIXED per-sample
    decalibrations from a rgg_data_*.pkl built by
    data/preprocess.generate_rgg_splits (ref data_preprocess/generate_rgg.py;
    the protocol's MSEE/MRR metrics need every evaluation to see the same
    perturbations).

    The pkl carries img/lidar path arrays plus (N, 3) rot (euler degrees,
    applied zyx like the online-calib sampler) and (N, 3) trans (meters)
    tables; *_val splits also carry 'train_split' indices — mode='train'
    selects them, mode='val' the complement, mode='test' everything.

    Calibration comes from the raw tree's own calib files when present
    (RawCalib on the date dir), else from CALIB_BY_DATE.
    """

    def __init__(
        self,
        pkl_path: str,
        mode: str = "test",
        base_path: Optional[str] = None,
        resize_w: int = 1216,
        resize_h: int = 352,
        sample_point: int = 8192,
        seed: int = 0,
        pc_filter: bool = True,
        emit_calib: bool = False,
    ):
        import pickle

        self.resize_w, self.resize_h = resize_w, resize_h
        self.sample_point = sample_point
        self.pc_filter = pc_filter
        self.fixed_decalib = False
        self.emit_calib = emit_calib
        self.rng = np.random.default_rng(seed)

        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        n = len(data["img"])
        if mode in ("train", "val"):
            if "train_split" not in data:
                raise ValueError(
                    f"{pkl_path} has no train_split — it is a test-only "
                    f"RGG split; mode={mode!r} would silently train on "
                    "the evaluation set"
                )
            if mode == "train":
                idx = np.asarray(data["train_split"], np.int64)
            else:
                idx = np.setdiff1d(
                    np.arange(n), np.asarray(data["train_split"])
                )
        else:
            idx = np.arange(n)

        def _reroot(p: str) -> str:
            # optional relocation of the pkl's recorded paths: base_path
            # replaces everything before the date directory (raw-KITTI
            # trees are .../<base>/<date>/<date>_drive_xxxx_sync/...)
            if base_path is None:
                return str(p)
            parts = str(p).replace("\\", "/").split("/")
            for j, seg in enumerate(parts):
                if seg.count("_") == 2 and seg[:4].isdigit():
                    return os.path.join(base_path, *parts[j:])
            return str(p)

        self.img_path = [_reroot(p) for p in np.asarray(data["img"])[idx]]
        self.lidar_path = [_reroot(p) for p in np.asarray(data["lidar"])[idx]]
        self.rot_table = np.asarray(data["rot"], np.float64)[idx]
        self.trans_table = np.asarray(data["trans"], np.float64)[idx]

        # date dir: .../<base>/<date>/<date>_drive_xxxx_sync/image_02/...
        drive_dir = os.path.dirname(
            os.path.dirname(os.path.dirname(self.img_path[0]))
        )
        date_dir = os.path.dirname(drive_dir)
        date = os.path.basename(date_dir)
        from i2pnet_tpu.data.calib import RawCalib

        if os.path.exists(os.path.join(date_dir, "calib_cam_to_cam.txt")):
            rc = RawCalib(date_dir)
            self.cam_intrinsic = rc.intrinsic
            self.velo_extrinsic = rc.extrinsic
        else:
            params = CALIB_BY_DATE[date]
            self.cam_intrinsic = np.array(
                [[params["fx"], 0, params["cx"]],
                 [0, params["fy"], params["cy"]], [0, 0, 1]]
            )
            self.velo_extrinsic = np.hstack(
                [np.asarray(params["rot"]), np.asarray(params["trans"])]
            )

    def get_decalibration(self, index: Optional[int] = None):
        r = np.deg2rad(self.rot_table[index])
        rot = euler_to_rotmat(r[0], r[1], r[2])
        trans = self.trans_table[index].reshape(3, 1)
        return np.hstack([rot, trans])
