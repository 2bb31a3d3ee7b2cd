"""Tests for offline preprocessing utilities."""

import os

import h5py
import numpy as np

from i2pnet_tpu.data import preprocess as PP


def test_voxel_downsample():
    pts = np.array(
        [[0.01, 0.01, 0.01, 1.0], [0.02, 0.02, 0.02, 3.0], [5.0, 5.0, 5.0, 2.0]],
        np.float32,
    )
    out = PP.voxel_downsample(pts, 0.1)
    assert out.shape == (2, 4)
    merged = out[np.argmin(out[:, 0])]
    np.testing.assert_allclose(merged, [0.015, 0.015, 0.015, 2.0], atol=1e-6)


def test_estimate_normals_plane():
    rng = np.random.default_rng(0)
    pts = np.zeros((200, 3), np.float32)
    pts[:, :2] = rng.uniform(-1, 1, size=(200, 2))  # z=0 plane
    normals = PP.estimate_normals(pts, radius=0.6, max_nn=20)
    # normals of a plane are +-z
    assert np.abs(normals[:, 2]).mean() > 0.99


def test_bin_to_npy_with_normals(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, size=(500, 4)).astype(np.float32)
    bin_path = tmp_path / "000000.bin"
    pts.tofile(bin_path)
    out = PP.bin_to_npy_with_normals(
        str(bin_path), str(tmp_path / "out" / "000000.npy"), voxel=0.2
    )
    assert out.shape[0] == 7
    loaded = np.load(tmp_path / "out" / "000000.npy")
    np.testing.assert_array_equal(loaded, out)
    # normals are unit (or the z fallback)
    n = np.linalg.norm(out[4:7], axis=0)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)


def test_poses_to_npz(tmp_path):
    poses = np.tile(np.eye(3, 4).reshape(1, -1), (3, 1))
    poses[1, 3] = 5.0  # tx
    txt = tmp_path / "00.txt"
    np.savetxt(txt, poses)
    n = PP.poses_to_npz(str(txt), str(tmp_path / "poses"))
    assert n == 3
    T1 = np.load(tmp_path / "poses" / "000001.npz")["pose"]
    assert T1[0, 3] == 5.0


def test_build_local_maps(tmp_path):
    rng = np.random.default_rng(2)
    scans = [rng.uniform(-20, 20, size=(300, 4)).astype(np.float32) for _ in range(2)]
    poses = [np.eye(4), np.eye(4)]
    poses[1] = poses[1].copy()
    poses[1][0, 3] = 3.0
    n = PP.build_local_maps(scans, poses, str(tmp_path / "maps"), voxel=0.5)
    assert n == 2
    with h5py.File(tmp_path / "maps" / "000000.h5", "r") as hf:
        pc = np.asarray(hf["PC"])
        assert pc.shape[0] == 4
        assert pc.shape[1] > 100
        # crop respected
        assert pc[0].min() > -10.0 - 1e-5 and pc[0].max() < 100.0


def test_generate_test_rt_deterministic():
    a = PP.generate_test_rt(16, seed=3)
    b = PP.generate_test_rt(16, seed=3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16, 6)
    assert np.abs(a[:, :3]).max() <= np.deg2rad(10.0)
    assert a[:, 5].max() <= 2.0  # full range by default
    c = PP.generate_test_rt(64, seed=3, clip_tz=True)
    assert c[:, 5].max() <= 1.0  # KITTI-CMR tz quirk on request


def test_load_test_rt_csv_and_pkl(tmp_path):
    import pickle

    from i2pnet_tpu.data.preprocess import (
        cmr_seed_value,
        cmr_test_rt_path,
        generate_test_rt,
        load_test_rt,
    )

    rt = generate_test_rt(5, seed=3)
    csv = tmp_path / "test_RT_seq00_10.00_2.00.csv"
    header = "rx,ry,rz,tx,ty,tz"
    np.savetxt(csv, rt, delimiter=",", header=header, comments="")
    np.testing.assert_allclose(load_test_rt(str(csv)), rt, atol=1e-12)

    # id+6 column variant (some reference tables carry a frame id)
    csv7 = tmp_path / "with_id.csv"
    np.savetxt(csv7, np.hstack([np.arange(5)[:, None], rt]), delimiter=",",
               header="id," + header, comments="")
    np.testing.assert_allclose(load_test_rt(str(csv7)), rt, atol=1e-12)

    # headerless variants: the first row is data, not column names — row 0
    # must survive (pandas default header inference would eat it and shift
    # every sample's decalibration by one)
    csv_h6 = tmp_path / "headerless6.csv"
    np.savetxt(csv_h6, rt, delimiter=",")
    np.testing.assert_allclose(load_test_rt(str(csv_h6)), rt, atol=1e-12)
    csv_h7 = tmp_path / "headerless7.csv"  # id,tx..tz,rx..rz (ref layout)
    np.savetxt(
        csv_h7,
        np.hstack([np.arange(5)[:, None], rt[:, 3:], rt[:, :3]]),
        delimiter=",",
    )
    np.testing.assert_allclose(load_test_rt(str(csv_h7)), rt, atol=1e-12)

    # per-seed pkl (the CMR 10-seed protocol format)
    p = cmr_test_rt_path(str(tmp_path), "00", 10.0, 2.0, 3)
    assert p.endswith(f"test_RT_seq00_10.00_2.00_{cmr_seed_value(3):d}.pkl")
    with open(p, "wb") as f:
        pickle.dump([list(r) for r in rt], f)
    np.testing.assert_allclose(load_test_rt(p), rt, atol=1e-12)

    # reference's documented seed->tag mapping
    assert [cmr_seed_value(s) for s in range(4)] == [0, 5, 0, 50]
