"""Native C++ IO library vs numpy fallbacks."""

import numpy as np
import pytest

from i2pnet_tpu.data import native_io as NIO


@pytest.fixture(scope="module")
def built():
    if not NIO.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_read_velodyne_bin(built, tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1000, 4)).astype(np.float32)
    path = tmp_path / "scan.bin"
    pts.tofile(path)
    xyz, inten = NIO.read_velodyne_bin(str(path))
    np.testing.assert_array_equal(xyz, pts[:, :3])
    np.testing.assert_array_equal(inten, pts[:, 3])


def test_transform_pad_points(built):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    E = rng.normal(size=(3, 4)).astype(np.float32)
    got = NIO.transform_pad_points(xyz, E, 600)
    want = np.zeros((600, 3), np.float32)
    want[:500] = xyz @ E[:, :3].T + E[:, 3]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxel_downsample_matches_numpy(built):
    from i2pnet_tpu.data.preprocess import voxel_downsample as np_vd

    rng = np.random.default_rng(2)
    pts = rng.uniform(-5, 5, size=(2000, 4)).astype(np.float32)
    got = NIO.voxel_downsample(pts, 0.5)
    want = np_vd(pts, 0.5)
    assert got.shape == want.shape
    # voxel sets are order-independent; compare sorted rows
    g = got[np.lexsort(got.T[::-1])]
    w = want[np.lexsort(want.T[::-1])]
    np.testing.assert_allclose(g, w, atol=1e-4)


def test_assemble_large_range_sample(built):
    rng = np.random.default_rng(3)
    n = 800
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    inten = rng.normal(size=(n,)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    perm = rng.permutation(n).astype(np.int64)
    E = rng.normal(size=(3, 4)).astype(np.float32)
    total = 1000
    lidar, feats, raw, sn = NIO.assemble_large_range_sample(
        xyz, inten, normals, perm, E, total
    )
    sel = perm
    np.testing.assert_allclose(raw[:n], xyz[sel], atol=1e-6)
    np.testing.assert_allclose(lidar[:n], xyz[sel] @ E[:, :3].T + E[:, 3], atol=1e-5)
    np.testing.assert_allclose(feats[:n, 0], inten[sel], atol=1e-6)
    np.testing.assert_allclose(sn[:n], normals[sel] @ E[:, :3].T, atol=1e-5)
    assert np.all(lidar[n:] == 0) and np.all(feats[n:] == 0)
    assert np.all(raw[n:] == 0) and np.all(sn[n:] == 0)
