"""Data-layer tests with synthetic on-disk fixtures.

The key invariant for both KITTI loaders: applying the decalibration ground
truth (q_gt, t_gt) to the decalibrated cloud `lidar` reproduces the
gt-camera-frame cloud Pc @ p.
"""

import os

import h5py
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from i2pnet_tpu.data import (
    BatchLoader,
    KittiLargeRangeDataset,
    KittiOdometryCMRDataset,
    collate,
)
from i2pnet_tpu.data import transforms as T
from i2pnet_tpu.data.calib import read_calib
from i2pnet_tpu.data.pipeline import to_model_batch

CALIB_TXT = """P0: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0
P2: 700.0 0.0 600.0 44.8 0.0 700.0 180.0 0.2 0.0 0.0 1.0 0.003
Tr: 0.0 -1.0 0.0 0.01 0.0 0.0 -1.0 -0.05 1.0 0.0 0.0 -0.3
"""


def _apply_qt(q, t, pts):
    R = Rotation.from_quat(np.roll(q, -1)).as_matrix()  # wxyz -> xyzw
    return pts @ R.T + t


@pytest.fixture(scope="module")
def cmr_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_cmr")
    rng = np.random.default_rng(0)
    for seq in (0, 3):
        seq_dir = root / "kitti_processed_CMRNet" / "sequences" / ("%02d" % seq)
        (seq_dir / "local_maps").mkdir(parents=True)
        (seq_dir / "image_2_npy").mkdir(parents=True)
        (seq_dir / "calib.txt").write_text(CALIB_TXT)
        for fi in range(3):
            pc = rng.uniform(-20, 20, size=(3, 500)).astype(np.float32)
            inten = rng.uniform(0, 1, size=(1, 500)).astype(np.float32)
            with h5py.File(seq_dir / "local_maps" / ("%06d.h5" % fi), "w") as hf:
                hf["PC"] = np.vstack([pc, np.ones((1, 500), np.float32)])
                hf["intensity"] = inten
            img = rng.integers(0, 255, size=(376, 1241, 3), dtype=np.uint8)
            np.save(seq_dir / "image_2_npy" / ("%06d.npy" % fi), img)
    return str(root)


@pytest.fixture(scope="module")
def large_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_large")
    rng = np.random.default_rng(1)
    for seq in (0, 9):
        seq_dir = (
            root
            / "kitti_processed_DeepI2P"
            / "data_odometry_velodyne"
            / "sequences"
            / ("%02d" % seq)
        )
        (seq_dir / "voxel0.1-SNr0.6").mkdir(parents=True)
        (seq_dir / "image_2_npy").mkdir(parents=True)
        (seq_dir / "calib.txt").write_text(CALIB_TXT)
        for fi in range(2):
            n = 800
            data = np.zeros((7, n), np.float32)
            data[0:3] = rng.uniform(-40, 40, size=(3, n))
            data[3] = rng.uniform(0, 1, size=n)
            data[4:7] = rng.normal(size=(3, n))
            np.save(seq_dir / "voxel0.1-SNr0.6" / ("%06d.npy" % fi), data)
            img = rng.integers(0, 255, size=(376, 1241, 3), dtype=np.uint8)
            np.save(seq_dir / "image_2_npy" / ("%06d.npy" % fi), img)
    return str(root)


def test_read_calib(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TXT)
    Tr, K, P = read_calib(str(p))
    assert Tr.shape == (3, 4)
    np.testing.assert_allclose(K[0, 0], 700.0)
    np.testing.assert_allclose(P[0, 3], (44.8 - 600.0 * 0.003) / 700.0, rtol=1e-5)


def test_cmr_dataset_sample(cmr_root):
    ds = KittiOdometryCMRDataset(cmr_root, mode="train", img_H=96, img_W=320,
                                 sample_point=1024, seed=0)
    # fixture has seqs 0 and 3; only 3 is in TRAIN_SEQS -> 3 frames
    assert len(ds) == 3
    s = ds[0]
    assert s["rgb"].shape == (96, 320, 3)
    assert s["lidar"].shape == (1024, 3)
    assert s["lidar_feats"].shape == (1024, 3)
    assert s["raw_point_xyz"].shape == (1024, 3)
    # invariant: q_gt/t_gt warp the decalibrated cloud back to gt camera frame
    restored = _apply_qt(s["decalib_real_gt"], s["decalib_dual_gt"], s["lidar"])
    np.testing.assert_allclose(restored, s["pc_cam"], atol=1e-3)


def test_cmr_train_split_filters_seqs(cmr_root):
    ds = KittiOdometryCMRDataset(cmr_root, mode="train")
    # TRAIN_SEQS = (3,5,6,7,8,9); only seq 3 exists in the fixture
    assert len(ds) == 3
    ds_test = KittiOdometryCMRDataset(
        cmr_root, mode="test",
        test_rt=np.zeros((3, 6), np.float32),
    )
    assert len(ds_test) == 3  # TEST_SEQS = (0,)
    s = ds_test[0]
    # zero decalib -> lidar == pc_cam
    np.testing.assert_allclose(s["lidar"], s["pc_cam"], atol=1e-4)
    np.testing.assert_allclose(s["decalib_real_gt"], [1, 0, 0, 0], atol=1e-6)


def test_large_range_sample(large_root):
    ds = KittiLargeRangeDataset(large_root, mode="train", img_H=96, img_W=320,
                                sample_point=1000, seed=0)
    assert len(ds) == 2  # only seq 0 in TRAIN_SEQS exists
    s = ds[0]
    assert s["rgb"].shape == (96, 320, 3)
    assert s["lidar"].shape == (1000, 3)
    assert s["lidar_feats"].shape == (1000, 1)
    # padded region is zero
    assert np.all(s["lidar"][800:] == 0)
    # invariant on the real (unpadded) points
    restored = _apply_qt(
        s["decalib_real_gt"], s["decalib_dual_gt"], s["lidar"][:800]
    )
    pc_h = np.concatenate([s["raw_point_xyz"][:800], np.ones((800, 1))], axis=1)
    Tr, K, P2 = read_calib(
        os.path.join(
            large_root,
            "kitti_processed_DeepI2P/data_odometry_velodyne/sequences/00/calib.txt",
        )
    )
    Pc = P2 @ np.vstack([Tr, [0, 0, 0, 1]])
    # raw_point_xyz was jittered separately from lidar; compare via transform
    # consistency instead: decalib(init @ p) == Pc @ p for the same p
    init = s["init_extrinsic"]
    p = pc_h  # jitter applied before both transforms, so consistent here?
    # lidar = init @ p exactly:
    np.testing.assert_allclose(
        s["lidar"][:800], (init @ p.T).T, atol=1e-3
    )
    np.testing.assert_allclose(restored, (Pc[:3] @ p.T).T, atol=1e-3)


def test_batch_loader_and_collate(cmr_root):
    ds = KittiOdometryCMRDataset(cmr_root, mode="train", img_H=96, img_W=320,
                                 sample_point=256, seed=0)
    loader = BatchLoader(ds, batch_size=2, seed=0)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["rgb"].shape == (2, 96, 320, 3)
    assert b["lidar"].shape == (2, 256, 3)
    mb = to_model_batch(b)
    assert "intrinsic" in mb and "decalib_q_gt" in mb and "raw_xyz" in mb


@pytest.fixture(scope="module")
def nus_root(tmp_path_factory):
    import pickle

    root = tmp_path_factory.mktemp("nus")
    rng = np.random.default_rng(3)
    entries = []
    (root / "maps").mkdir()
    (root / "imgs").mkdir()
    K = np.array([[800.0, 0, 800], [0, 800.0, 450], [0, 0, 1]])
    velo2cam2 = np.eye(4)
    velo2cam2[:3, :3] = Rotation.from_euler("x", -np.pi / 2).as_matrix()
    velo2cam2[:3, 3] = [0.0, -0.3, 0.5]
    for i in range(3):
        with h5py.File(root / "maps" / f"{i}.h5", "w") as hf:
            hf["PC"] = rng.uniform(-20, 20, size=(3, 400)).astype(np.float32)
            hf["intensity"] = rng.uniform(0, 1, size=(1, 400)).astype(np.float32)
        from PIL import Image

        Image.fromarray(
            rng.integers(0, 255, size=(900, 1600, 3), dtype=np.uint8)
        ).save(root / "imgs" / f"{i}.jpg")
        entries.append(((f"maps/{i}.h5", f"imgs/{i}.jpg"), K, velo2cam2, None))
    split = root / "train.list"
    with open(split, "wb") as f:
        pickle.dump(entries, f)
    return str(root), str(split)


def test_nuscenes_cmr(nus_root):
    from i2pnet_tpu.data import NuScenesCMRDataset

    root, split = nus_root
    ds = NuScenesCMRDataset(root, [split], mode="train", sample_point=512, seed=0)
    assert len(ds) == 3
    s = ds[0]
    assert s["rgb"].shape == (640, 1280, 3)
    assert s["lidar"].shape == (512, 3)
    restored = _apply_qt(s["decalib_real_gt"], s["decalib_dual_gt"], s["lidar"][:400])
    np.testing.assert_allclose(restored, s["pc_cam"][:400], atol=1e-3)


def test_nuscenes_large(nus_root):
    from i2pnet_tpu.data import NuScenesLargeRangeDataset

    root, split = nus_root
    ds = NuScenesLargeRangeDataset(root, [split], mode="train",
                                   sample_point=1000, seed=0)
    s = ds[0]
    assert s["rgb"].shape == (160, 512, 3)
    assert s["lidar"].shape == (1000, 3)
    assert s["lidar_feats"].shape == (1000, 1)
    assert np.all(s["lidar"][400:] == 0)
    # raw frame axis swap (ref nuscenes_loader_cmr.py:389-394)
    assert s["raw_point_xyz"].shape == (1000, 3)


@pytest.fixture(scope="module")
def raw_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_raw")
    rng = np.random.default_rng(4)
    drive_dir = root / "2011_09_26" / "2011_09_26_drive_0005_sync"
    (drive_dir / "image_02" / "data").mkdir(parents=True)
    (drive_dir / "velodyne_points" / "data").mkdir(parents=True)
    import cv2

    for i in range(2):
        img = rng.integers(0, 255, size=(375, 1242, 3), dtype=np.uint8)
        cv2.imwrite(str(drive_dir / "image_02" / "data" / f"{i:010d}.png"), img)
        pts = rng.uniform(2, 50, size=(9000, 4)).astype(np.float32)
        pts.tofile(drive_dir / "velodyne_points" / "data" / f"{i:010d}.bin")
    return str(root)


def test_kitti_raw_calib(raw_root):
    from i2pnet_tpu.data import KittiRawCalibDataset

    ds = KittiRawCalibDataset(
        raw_root, "2011_09_26", [5], d_rot=10, d_trans=1.0,
        fixed_decalib=False, sample_point=4096, seed=0,
    )
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb"].shape == (352, 1216, 3)
    assert s["lidar"].shape == (4096, 3)
    # applying gt correction to init extrinsic recovers velo extrinsic
    init4 = np.vstack([s["init_extrinsic"], [0, 0, 0, 1]])
    q, t = s["decalib_real_gt"], s["decalib_dual_gt"]
    R = Rotation.from_quat(np.roll(q, -1)).as_matrix()
    corr = np.vstack([np.hstack([R, t.reshape(3, 1)]), [0, 0, 0, 1]])
    velo_rec = (corr @ init4)[:3]
    np.testing.assert_allclose(velo_rec, ds.velo_extrinsic, atol=1e-5)
