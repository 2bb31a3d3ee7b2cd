"""Offline preprocessing (ref /root/reference/data_preprocess/).

Torch/Open3D-free equivalents:
  * bin_to_npy_with_normals == kitti_pc_bin_to_npy_with_downsample_sn.py:28-65
    (voxel downsample + surface normals; KDTree hybrid search r=0.6, nn=30 —
    scipy cKDTree + PCA instead of Open3D)
  * images_to_npy == kitti_png_to_npy.py:20-33
  * poses_to_npz == kitti_pose.py:26-44
  * build_local_maps == CMRNet_script/kitti_maps_cmr.py:43-120 (voxelized
    accumulated map + per-frame local crops into h5)
  * generate_test_rt == fixed test decalibration tables (CMRNet protocol)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Average points per voxel. points: (N, C) with xyz first."""
    coords = np.floor_divide(points[:, :3] - points[:, :3].min(0), voxel).astype(
        np.int64
    )
    _, inverse, counts = np.unique(
        coords, axis=0, return_inverse=True, return_counts=True
    )
    out = np.zeros((counts.shape[0], points.shape[1]), np.float64)
    np.add.at(out, inverse, points)
    return (out / counts[:, None]).astype(np.float32)


def estimate_normals(
    points: np.ndarray, radius: float = 0.6, max_nn: int = 30
) -> np.ndarray:
    """PCA surface normals with hybrid KDTree search (ref preprocessing's
    Open3D KDTreeSearchParamHybrid(radius=0.6, max_nn=30))."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    dists, idx = tree.query(points, k=max_nn, distance_upper_bound=radius)
    normals = np.zeros_like(points)
    valid = dists < np.inf
    for i in range(points.shape[0]):
        nbrs = idx[i][valid[i]]
        if len(nbrs) < 3:
            normals[i] = [0, 0, 1]
            continue
        p = points[nbrs] - points[nbrs].mean(0)
        cov = p.T @ p
        w, v = np.linalg.eigh(cov)
        normals[i] = v[:, 0]
    return normals.astype(np.float32)


def bin_to_npy_with_normals(
    bin_path: str,
    out_path: str,
    voxel: float = 0.1,
    sn_radius: float = 0.6,
    sn_max_nn: int = 30,
) -> np.ndarray:
    """Velodyne .bin -> (7, N) npy rows [x, y, z, intensity, nx, ny, nz]."""
    pts = np.fromfile(bin_path, np.float32).reshape(-1, 4)
    if voxel > 0:
        pts = voxel_downsample(pts, voxel)
    normals = estimate_normals(pts[:, :3], sn_radius, sn_max_nn)
    out = np.concatenate([pts, normals], axis=1).T.astype(np.float32)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.save(out_path, out)
    return out


def images_to_npy(img_dir: str, out_dir: str) -> int:
    """PNG images -> npy arrays (ref kitti_png_to_npy.py:20-33)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(img_dir)):
        if not fname.endswith(".png"):
            continue
        arr = np.array(Image.open(os.path.join(img_dir, fname)), np.uint8)
        np.save(os.path.join(out_dir, fname.replace(".png", ".npy")), arr)
        n += 1
    return n


def poses_to_npz(pose_txt: str, out_dir: str) -> int:
    """Odometry pose txt (12 floats/row) -> per-frame 4x4 npz
    (ref kitti_pose.py:26-44)."""
    os.makedirs(out_dir, exist_ok=True)
    poses = np.loadtxt(pose_txt).reshape(-1, 3, 4)
    for i, p in enumerate(poses):
        T = np.vstack([p, [0, 0, 0, 1]])
        np.savez(os.path.join(out_dir, "%06d.npz" % i), pose=T)
    return len(poses)


def build_local_maps(
    scans: Sequence[np.ndarray],
    poses: Sequence[np.ndarray],
    out_dir: str,
    voxel: float = 0.1,
    x_range: Tuple[float, float] = (-10.0, 100.0),
    y_range: Tuple[float, float] = (-25.0, 25.0),
) -> int:
    """Accumulate scans into a voxelized global map, then crop one local map
    per pose into h5 (ref CMRNet_script/kitti_maps_cmr.py:43-120).

    scans: list of (N_i, >=4) arrays [xyz, intensity] in the sensor frame;
    poses: list of 4x4 sensor-to-world transforms.
    """
    import h5py

    world = []
    for scan, T in zip(scans, poses):
        xyz1 = np.concatenate(
            [scan[:, :3], np.ones((scan.shape[0], 1))], axis=1
        )
        w = (T @ xyz1.T).T[:, :3]
        world.append(np.concatenate([w, scan[:, 3:4]], axis=1))
    gmap = voxel_downsample(np.concatenate(world, 0), voxel)

    os.makedirs(out_dir, exist_ok=True)
    for i, T in enumerate(poses):
        Tinv = np.linalg.inv(T)
        local = (
            Tinv @ np.concatenate(
                [gmap[:, :3], np.ones((gmap.shape[0], 1))], axis=1
            ).T
        ).T[:, :3]
        m = (
            (local[:, 0] > x_range[0])
            & (local[:, 0] < x_range[1])
            & (local[:, 1] > y_range[0])
            & (local[:, 1] < y_range[1])
        )
        with h5py.File(os.path.join(out_dir, "%06d.h5" % i), "w") as hf:
            hf["PC"] = np.concatenate(
                [local[m].T, np.ones((1, int(m.sum())))], axis=0
            ).astype(np.float32)
            hf["intensity"] = gmap[m, 3:4].T.astype(np.float32)
    return len(poses)


def _load_pose(path: str) -> np.ndarray:
    """Per-frame 4x4 pose npz; accepts both this repo's 'pose' key and the
    reference's positional 'arr_0' (ref kitti_pc_acc.py:47,81)."""
    d = np.load(path)
    return (d["pose"] if "pose" in d else d["arr_0"]).astype(np.float32)


def accumulate_point_cloud(
    pc_folder: str,
    pose_folder: str,
    seq_i: int,
    seq_sample_num: int,
    Pc: np.ndarray,
    accumulation_frame_num: int = 3,
    accumulation_frame_skip: int = 6,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Accumulate neighbor sweeps into frame i's cloud
    (ref data_preprocess/kitti_pc_acc.py:25-112 get_accumulated_pc).

    pc_folder holds (7, N) npys [xyz, intensity, normals]; pose_folder
    per-frame 4x4 npz. Up to accumulation_frame_num frames are taken every
    accumulation_frame_skip steps in each direction; each is warped into
    frame i's camera-conditioned frame by Pc^-1 @ P_i^-1 P_j @ Pc, with the
    rotation-only transform applied to the normals. Frame i's own points are
    shuffled first (the reference calls this 'necessary': downstream loaders
    truncate, so the order must not encode the scan pattern).

    Returns (7, M) accumulated [xyz, intensity, normals].
    """
    rng = rng or np.random.default_rng(0)
    data = np.load(os.path.join(pc_folder, "%06d.npy" % seq_i)).astype(np.float32)
    data = data[:, rng.permutation(data.shape[1])]
    parts = [data]
    P_oi = _load_pose(os.path.join(pose_folder, "%06d.npz" % seq_i))
    P_io = np.linalg.inv(P_oi)
    Pc_inv = np.linalg.inv(Pc)
    for stride in (-accumulation_frame_skip, accumulation_frame_skip):
        counter = 0
        found = 0
        while found < accumulation_frame_num:
            counter += 1
            seq_j = seq_i + stride * counter
            if seq_j < 0 or seq_j >= seq_sample_num:
                break
            nb = np.load(os.path.join(pc_folder, "%06d.npy" % seq_j)).astype(
                np.float32
            )
            P_oj = _load_pose(os.path.join(pose_folder, "%06d.npz" % seq_j))
            P = Pc_inv @ (P_io @ P_oj) @ Pc
            xyz = P[:3, :3] @ nb[0:3] + P[:3, 3:4]
            sn = P[:3, :3] @ nb[4:7]
            parts.append(np.concatenate([xyz, nb[3:4], sn], axis=0))
            found += 1
    return np.concatenate(parts, axis=1)


def process_sequence_accumulation(
    pc_folder: str,
    pose_folder: str,
    calib_path: str,
    out_folder_snr: str,
    out_folder_pc: str,
    downsample_voxel: float = 0.3,
    max_points: int = 2 * 20480,
    seed: int = 0,
) -> int:
    """kitti_pc_acc.py's per-sequence driver (ref :163-202): accumulate every
    frame, voxel-downsample when the cloud exceeds max_points, write both the
    full (7, N) '*_snr_acc' npy and the bare-xyz '*_acc' npy."""
    from i2pnet_tpu.data.calib import read_calib

    Tr, _, P = read_calib(calib_path)
    Pc = P @ np.vstack([Tr, [0, 0, 0, 1]])
    os.makedirs(out_folder_snr, exist_ok=True)
    os.makedirs(out_folder_pc, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = len([f for f in os.listdir(pc_folder) if f.endswith(".npy")])
    for i in range(n):
        acc = accumulate_point_cloud(pc_folder, pose_folder, i, n, Pc, rng=rng)
        if acc.shape[1] > max_points:
            acc = voxel_downsample(acc.T, downsample_voxel).T
        np.save(os.path.join(out_folder_snr, "%06d.npy" % i),
                acc.astype(np.float32))
        np.save(os.path.join(out_folder_pc, "%06d.npy" % i),
                acc[0:3].astype(np.float32))
    return n


# RGGNet-protocol split definitions (ref data_preprocess/generate_rgg.py:6-91
# — protocol constants: raw-KITTI drives, sample counts, decalib amplitudes).
_RGG_DRIVES_0926 = (1, 2, 9, 11, 13, 14, 15, 17, 18, 19, 20, 22, 23, 27, 28,
                    29, 32, 35, 36, 39, 46, 48, 51, 52, 56, 57, 59, 60, 61,
                    64, 79, 84, 86, 87, 91, 93, 95, 96, 101, 104, 106, 113,
                    117)
RGG_SPLITS = {
    "train1_val": dict(date="2011_09_26", num=24000, drives=_RGG_DRIVES_0926,
                       rot=15.0, trans=0.2, train_split=22000),
    "train2": dict(date="2011_09_26", num=4000, drives=_RGG_DRIVES_0926,
                   rot=0.0, trans=0.3),
    "train3": dict(date="2011_09_26", num=4000, drives=_RGG_DRIVES_0926,
                   rot=20.0, trans=0.0),
    "train_val_ex": dict(date="2011_10_03", num=2000, drives=(27,),
                         rot=2.0, trans=0.3, train_split=1800),
    "T1": dict(date="2011_09_26", num=2000, drives=(5, 70), rot=15.0, trans=0.2),
    "T2a": dict(date="2011_09_26", num=2000, drives=_RGG_DRIVES_0926,
                rot=10.0, trans=0.2),
    "T2b": dict(date="2011_09_26", num=2000, drives=(5, 70), rot=10.0, trans=0.2),
    "T3": dict(date="2011_10_03", num=2000, drives=(27,), rot=2.0, trans=0.3),
}


def generate_rgg_splits(
    base_path: str,
    save_dir: str,
    seed: int = 0,
    splits: Optional[Sequence[str]] = None,
) -> list:
    """Build the RGGNet-protocol fixed decalib test/train sets
    (ref generate_rgg.py:94-191): per split, sample `num` (image, lidar)
    pairs from the drives (with repetition when the pool is smaller) and a
    fixed per-sample euler-degree rot / meter trans table; pickle as
    rgg_data_<key>.pkl. Splits with a train_split count also carry the
    train-index subset. Returns the written paths."""
    import pickle

    os.makedirs(save_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    written = []
    for key, p in RGG_SPLITS.items():
        if splits is not None and key not in splits:
            continue
        imgs, lidars = [], []
        for drive in p["drives"]:
            drive_dir = os.path.join(
                base_path, p["date"], f"{p['date']}_drive_{drive:04d}_sync"
            )
            img_dir = os.path.join(drive_dir, "image_02", "data")
            lid_dir = os.path.join(drive_dir, "velodyne_points", "data")
            if not os.path.isdir(img_dir) or not os.path.isdir(lid_dir):
                continue
            d_imgs = [
                os.path.join(img_dir, f)
                for f in sorted(os.listdir(img_dir)) if f.endswith(".png")
            ]
            d_lidars = [
                os.path.join(lid_dir, f)
                for f in sorted(os.listdir(lid_dir)) if f.endswith(".bin")
            ]
            # positional pairing requires equal counts — a dropped frame
            # would silently shift every later (img, scan) pair otherwise
            if len(d_imgs) != len(d_lidars):
                raise ValueError(
                    f"{drive_dir}: {len(d_imgs)} images vs "
                    f"{len(d_lidars)} scans — cannot pair positionally"
                )
            imgs.extend(d_imgs)
            lidars.extend(d_lidars)
        M, N = len(imgs), p["num"]
        if M == 0:
            continue
        if M >= N:
            choice = rng.choice(M, N, replace=False)
        else:  # tile full permutations, then top up (ref :123-127)
            choice = np.concatenate(
                [rng.permutation(M) for _ in range(N // M)]
                + [rng.choice(M, N % M, replace=False)]
            )[:N]
        data = {
            "img": np.array(imgs)[choice],
            "lidar": np.array(lidars)[choice],
            "rot": rng.random((N, 3)) * (2 * p["rot"]) - p["rot"],
            "trans": rng.random((N, 3)) * (2 * p["trans"]) - p["trans"],
        }
        if "train_split" in p:
            data["train_split"] = rng.choice(
                N, min(p["train_split"], N), replace=False
            )
        out = os.path.join(save_dir, f"rgg_data_{key}.pkl")
        with open(out, "wb") as f:
            pickle.dump(data, f)
        written.append(out)
    return written


def generate_test_rt(
    n: int,
    max_r_deg: float = 10.0,
    max_t: float = 2.0,
    seed: int = 0,
    clip_tz: bool = False,
) -> np.ndarray:
    """Fixed test decalibration table (rows [rx, ry, rz, tx, ty, tz] in
    rad/m), the artifact behind test_RT_*.csv / .pkl. clip_tz mirrors the
    KITTI-CMR train sampler's tz<=1 m quirk; tables default to the full
    range."""
    rng = np.random.default_rng(seed)
    r = np.deg2rad(max_r_deg)
    rt = np.stack(
        [
            rng.uniform(-r, r, n),
            rng.uniform(-r, r, n),
            rng.uniform(-r, r, n),
            rng.uniform(-max_t, max_t, n),
            rng.uniform(-max_t, max_t, n),
            rng.uniform(-max_t, min(max_t, 1.0) if clip_tz else max_t, n),
        ],
        axis=1,
    )
    return rt.astype(np.float64)


def load_test_rt(path: str) -> np.ndarray:
    """Load a fixed test-decalibration table from either protocol format:
    the CSV the reference reads for mode='test' (ref
    kitti_odometry_cmr.py:259-265; its shipped header is
    'id,tx,ty,tz,rx,ry,rz' — translation FIRST) or the per-seed pickle
    lists of the CMR 10-seed protocol (ref :274-283; 6-element rows in
    rx-first order, matching the live unpack at ref :473). ALWAYS returns
    (N, 6) float64 rows normalized to [rx, ry, rz, tx, ty, tz] — column
    names, when present, drive the reordering, so a tx-first reference
    CSV cannot silently swap meters and radians."""
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            rows = pickle.load(f)
        rt = np.asarray(rows, np.float64)
        if rt.shape[1] == 7:
            rt = rt[:, [4, 5, 6, 1, 2, 3]]  # id,tx..rz -> rx..tz
    else:
        import pandas as pd

        # sniff: a truly headerless table starts with an all-numeric row;
        # pandas' default header inference would consume it as column
        # names and silently drop sample 0 (shifting every decalibration)
        with open(path) as f:
            first = f.readline()

        def _numeric_row(line: str) -> bool:
            cells = [c.strip() for c in line.strip().split(",") if c.strip()]
            if not cells:
                return False
            try:
                [float(c) for c in cells]
            except ValueError:
                return False
            return True

        if _numeric_row(first):
            rt = pd.read_csv(path, sep=",", header=None).to_numpy(np.float64)
            if rt.shape[1] == 7:
                # headerless id+6: assume the reference CSV layout
                rt = rt[:, [4, 5, 6, 1, 2, 3]]
        else:
            df = pd.read_csv(path, sep=",")
            cols = {str(c).strip().lower(): c for c in df.columns}
            want = ["rx", "ry", "rz", "tx", "ty", "tz"]
            if all(w in cols for w in want):
                rt = df[[cols[w] for w in want]].to_numpy(np.float64)
            else:
                rt = df.to_numpy(np.float64)
                if rt.shape[1] == 7:
                    rt = rt[:, [4, 5, 6, 1, 2, 3]]
    if rt.shape[1] != 6:
        raise ValueError(f"{path}: expected 6 (or id+6) columns, got {rt.shape[1]}")
    return rt


def cmr_seed_value(cmr_seed: int) -> int:
    """The reference's cmr_seed -> filename-tag mapping
    (ref kitti_odometry_cmr.py:274-275: ((seed % 2) * 5) * 10**(seed // 2)),
    e.g. seeds 0..9 -> 0, 5, 0, 50, 0, 500, ... as written."""
    return ((cmr_seed % 2) * 5) * 10 ** (cmr_seed // 2)


def cmr_test_rt_path(
    dir_path: str, seq: str, max_r: float, max_t: float, cmr_seed: int
) -> str:
    """Per-seed pickle path of the CMR 10-seed protocol
    (ref kitti_odometry_cmr.py:276-278)."""
    return os.path.join(
        dir_path,
        f"test_RT_seq{seq}_{max_r:.2f}_{max_t:.2f}_{cmr_seed_value(cmr_seed):d}.pkl",
    )
