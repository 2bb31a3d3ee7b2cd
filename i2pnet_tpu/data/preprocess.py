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
