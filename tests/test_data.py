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

    # efgh variant: emit_calib adds the per-sample projection matrix
    # resized-K @ [I|0] (the reference's own efgh dataset files are absent
    # from its snapshot; see KittiRawCalibDataset.__init__)
    ds_e = KittiRawCalibDataset(
        raw_root, "2011_09_26", [5], d_rot=10, d_trans=1.0,
        fixed_decalib=False, sample_point=4096, seed=0, emit_calib=True,
    )
    se = ds_e[0]
    assert se["calib"].shape == (3, 4)
    np.testing.assert_allclose(se["calib"][:, :3], se["init_intrinsic"],
                               atol=1e-6)
    np.testing.assert_array_equal(se["calib"][:, 3], 0.0)
    assert "calib" not in s


def test_generate_rgg_splits_and_dataset(raw_root, tmp_path):
    """RGG protocol: split generation (ref generate_rgg.py:94-191) feeds the
    fixed-decalib dataset; same pkl -> identical perturbations every run."""
    from i2pnet_tpu.data import KittiRGGDataset
    from i2pnet_tpu.data.preprocess import generate_rgg_splits

    save_dir = str(tmp_path / "rgg")
    written = generate_rgg_splits(raw_root, save_dir, seed=0, splits=["T1"])
    assert len(written) == 1 and written[0].endswith("rgg_data_T1.pkl")

    import pickle

    with open(written[0], "rb") as f:
        data = pickle.load(f)
    # T1: 2000 samples from drives (5, 70) — fixture only has drive 5 with
    # 2 frames, so paths repeat (tiled permutations, ref :123-127)
    assert len(data["img"]) == 2000 and len(data["lidar"]) == 2000
    assert data["rot"].shape == (2000, 3) and np.abs(data["rot"]).max() <= 15.0
    assert np.abs(data["trans"]).max() <= 0.2

    ds = KittiRGGDataset(written[0], mode="test", sample_point=2048, seed=0)
    assert len(ds) == 2000
    s0a = ds[0]
    s0b = KittiRGGDataset(written[0], mode="test", sample_point=2048, seed=0)[0]
    # decalibration is FIXED per index (the protocol's whole point)
    np.testing.assert_array_equal(s0a["decalib_real_gt"], s0b["decalib_real_gt"])
    np.testing.assert_array_equal(s0a["decalib_dual_gt"], s0b["decalib_dual_gt"])
    assert s0a["rgb"].shape == (352, 1216, 3)
    assert s0a["lidar"].shape == (2048, 3)

    # train/val split partitions a *_val pkl; this split's date dir also
    # carries raw calib files, exercising the RawCalib path
    date_dir = tmp_path / "raw2" / "2011_10_03"
    drive_dir = date_dir / "2011_10_03_drive_0027_sync"
    (drive_dir / "image_02" / "data").mkdir(parents=True)
    (drive_dir / "velodyne_points" / "data").mkdir(parents=True)
    rng = np.random.default_rng(7)
    import cv2

    for i in range(2):
        cv2.imwrite(str(drive_dir / "image_02" / "data" / f"{i:010d}.png"),
                    rng.integers(0, 255, size=(376, 1241, 3), dtype=np.uint8))
        rng.uniform(2, 50, size=(5000, 4)).astype(np.float32).tofile(
            drive_dir / "velodyne_points" / "data" / f"{i:010d}.bin")
    (date_dir / "calib_cam_to_cam.txt").write_text(
        "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
        "P_rect_02: 700.0 0.0 600.0 40.0 0.0 700.0 180.0 1.0 0.0 0.0 1.0 0.005\n"
    )
    (date_dir / "calib_velo_to_cam.txt").write_text(
        "R: 0 -1 0 0 0 -1 1 0 0\nT: 0.05 -0.07 -0.27\n"
    )
    gen2 = generate_rgg_splits(str(tmp_path / "raw2"), save_dir, seed=0,
                               splits=["train_val_ex"])
    tr = KittiRGGDataset(gen2[0], mode="train", sample_point=1024)
    vl = KittiRGGDataset(gen2[0], mode="val", sample_point=1024)
    assert len(tr) + len(vl) == 2000 and len(tr) == 1800
    s = tr[0]
    assert s["lidar"].shape == (1024, 3)
    # intrinsic came from the date dir's calib files, not CALIB_BY_DATE
    assert abs(tr.cam_intrinsic[0, 0] - 700.0) < 1e-6


def test_accumulate_point_cloud(tmp_path):
    """Neighbor sweeps folded into frame i's frame with pose+calib chain
    (ref kitti_pc_acc.py:25-112): a static world point seen from shifted
    poses lands on itself after accumulation."""
    from i2pnet_tpu.data.preprocess import (
        accumulate_point_cloud,
        process_sequence_accumulation,
    )

    pc_dir = tmp_path / "pc"
    pose_dir = tmp_path / "poses"
    pc_dir.mkdir()
    pose_dir.mkdir()
    rng = np.random.default_rng(0)
    n_frames, skip = 13, 6
    world_pts = rng.uniform(-5, 5, size=(3, 64)).astype(np.float32)
    Pc = np.identity(4, np.float32)
    Pc[:3, 3] = [0.1, -0.2, 0.3]
    for i in range(n_frames):
        pose = np.identity(4, np.float32)
        pose[0, 3] = i * 2.0  # drive along x
        np.savez(pose_dir / ("%06d.npz" % i), pose=pose)
        # sensor-frame points of the static world cloud: Pc^-1 @ pose^-1 @ w
        T = np.linalg.inv(pose @ Pc)
        local = T[:3, :3] @ world_pts + T[:3, 3:4]
        arr = np.concatenate(
            [local, rng.uniform(0, 1, (1, 64)).astype(np.float32),
             np.tile([[0.0], [0.0], [1.0]], (1, 64)).astype(np.float32)], 0,
        )
        np.save(pc_dir / ("%06d.npy" % i), arr)

    acc = accumulate_point_cloud(str(pc_dir), str(pose_dir), 6, n_frames, Pc)
    # frame 6 + 1 prev (frame 0) + 1 next (frame 12) in range at skip 6
    assert acc.shape == (7, 64 * 3)
    own = np.linalg.inv(np.asarray(
        np.load(pose_dir / "000006.npz")["pose"]) @ Pc)
    expect = own[:3, :3] @ world_pts + own[:3, 3:4]
    # all three accumulated copies must coincide with frame 6's own view
    for k in range(3):
        chunk = acc[:3, 64 * k:64 * (k + 1)]
        got = chunk[:, np.lexsort(chunk)]
        want = expect[:, np.lexsort(expect)]
        np.testing.assert_allclose(got, want, atol=1e-4)

    # sequence driver writes both npy families
    calib = tmp_path / "calib.txt"
    calib.write_text(
        "P2: 64.0 0.0 64.0 0.0 0.0 64.0 32.0 0.0 0.0 0.0 1.0 0.0\n"
        "Tr: 1.0 0.0 0.0 0.1 0.0 1.0 0.0 -0.2 0.0 0.0 1.0 0.3\n"
    )
    out_snr = tmp_path / "acc_snr"
    out_pc = tmp_path / "acc_pc"
    n = process_sequence_accumulation(
        str(pc_dir), str(pose_dir), str(calib), str(out_snr), str(out_pc)
    )
    assert n == n_frames
    a = np.load(out_snr / "000000.npy")
    b = np.load(out_pc / "000000.npy")
    assert a.shape[0] == 7 and b.shape[0] == 3 and a.shape[1] == b.shape[1]


def test_raw_calib_real_format_files(tmp_path):
    """Format-drift guard: parse REAL raw-KITTI calib files (actual key
    names + line layout of the devkit's calib_cam_to_cam.txt /
    calib_velo_to_cam.txt) and check the composed velo->rect-cam2
    extrinsic reproduces the reference's precomputed 2011_09_26 constants
    (ref src/calib.py:19-41: CAM02_PARAMS = (R_rect_00, P-folded t),
    VELO_PARAMS = the composed product)."""
    from i2pnet_tpu.data.calib import RawCalib
    from i2pnet_tpu.data.kitti_raw_calib import CALIB_BY_DATE

    # original velo->cam0 calibration (the values the reference commented
    # out before composing, src/calib.py:32-35)
    R_velo = np.array(
        [[7.533745e-03, -9.999714e-01, -6.166020e-04],
         [1.480249e-02, 7.280733e-04, -9.998902e-01],
         [9.998621e-01, 7.523790e-03, 1.480755e-02]]
    )
    t_velo = np.array([-4.069766e-03, -7.631618e-02, -2.717806e-01])
    # the true devkit R_rect_00 for 2011_09_26 (the reference composed its
    # hardcoded VELO_PARAMS with this, not with the cam0->cam2 rotation)
    R_rect = np.array(
        [[9.999239e-01, 9.837760e-03, -7.445048e-03],
         [-9.869795e-03, 9.999421e-01, -4.278459e-03],
         [7.402527e-03, 4.351614e-03, 9.999631e-01]]
    )
    cam = CALIB_BY_DATE["2011_09_26"]
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    # P_rect_02-folded cam0->cam2 translation (composed_t - R_rect @ t_velo)
    t_cam02 = np.array([6.21690000e-02, 2.99890000e-04, 2.74591000e-03])
    p03 = t_cam02[0] * fx + cx * t_cam02[2]
    p13 = t_cam02[1] * fy + cy * t_cam02[2]
    p23 = t_cam02[2]

    date_dir = tmp_path / "2011_09_26"
    date_dir.mkdir()

    def fmt(a):
        return " ".join(f"{v:.6e}" for v in np.asarray(a).ravel())

    (date_dir / "calib_cam_to_cam.txt").write_text(
        "calib_time: 09-Jan-2012 13:57:47\n"
        "corner_dist: 9.950000e-02\n"
        "S_00: 1.392000e+03 5.120000e+02\n"
        f"K_00: {fmt(np.eye(3))}\n"
        "D_00: -3.691481e-01 1.968681e-01 1.353473e-03 5.677587e-04 -6.770705e-02\n"
        f"R_rect_00: {fmt(R_rect)}\n"
        f"P_rect_00: {fmt(np.hstack([np.diag([fx, fy, 1.0]), np.zeros((3, 1))]))}\n"
        f"P_rect_02: {fx:.6e} 0.000000e+00 {cx:.6e} {p03:.6e} "
        f"0.000000e+00 {fy:.6e} {cy:.6e} {p13:.6e} "
        f"0.000000e+00 0.000000e+00 1.000000e+00 {p23:.6e}\n"
    )
    (date_dir / "calib_velo_to_cam.txt").write_text(
        "calib_time: 15-Mar-2012 11:37:16\n"
        f"R: {fmt(R_velo)}\n"
        f"T: {fmt(t_velo)}\n"
        "delta_f: 0.000000e+00 0.000000e+00\n"
        "delta_c: 0.000000e+00 0.000000e+00\n"
    )

    rc = RawCalib(str(date_dir))
    np.testing.assert_allclose(rc.intrinsic[0, 0], fx)
    np.testing.assert_allclose(
        rc.extrinsic[:, :3], np.asarray(cam["rot"]), atol=2e-5
    )
    np.testing.assert_allclose(
        rc.extrinsic[:, 3], np.asarray(cam["trans"]).ravel(), atol=2e-5
    )


def test_evaluator_efgh_end_to_end(raw_root, tmp_path):
    """Online-calibration EFGH eval: the raw loader emits data['calib'],
    the Evaluator threads it through the efgh forward, and the protocol
    artifacts come out (ref evaluation.py:354-356 + the efgh dataset
    branch that is vestigial upstream)."""
    import dataclasses

    import jax

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.data import KittiRawCalibDataset
    from i2pnet_tpu.data.pipeline import BatchLoader
    from i2pnet_tpu.eval import Evaluator
    from i2pnet_tpu.models import I2PNet

    cfg = dataclasses.replace(I2PNetConfig.tiny(), efgh=True)
    model = I2PNet(cfg)
    ds = KittiRawCalibDataset(
        raw_root, "2011_09_26", [5], d_rot=5, d_trans=0.5,
        fixed_decalib=True, resize_w=128, resize_h=64,
        sample_point=cfg.lidar_in_points, seed=0, emit_calib=True,
    )
    s = ds[0]
    import jax.numpy as jnp

    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s["rgb"])[None],
        jnp.asarray(s["lidar"])[None],
        jnp.asarray(s["init_intrinsic"])[None],
        calib=jnp.asarray(s["calib"])[None],
        train=False,
    )
    ds.rng = np.random.default_rng(0)  # template fetch consumed draws

    log_dir = str(tmp_path / "efgh_eval")
    ev = Evaluator(model, cfg, [variables["params"]],
                   [variables["batch_stats"]], proj=False, log_dir=log_dir)
    summary = ev.validate(BatchLoader(ds, 2, shuffle=False, drop_last=False))
    assert np.isfinite(summary["rre_mean"]) and np.isfinite(summary["rte_mean"])
    assert os.path.exists(os.path.join(log_dir, "prediction.txt"))
