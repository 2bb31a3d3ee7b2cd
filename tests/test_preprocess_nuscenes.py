"""nuScenes preprocessing pipeline tests.

Drives i2pnet_tpu/data/preprocess_nuscenes.py against a schema-faithful stub
of the nuScenes devkit (same tables / record fields / binary sweep layout as
v1.0: scene, sample, sample_data, ego_pose, calibrated_sensor), then loads
the generated datasplits with the real NuScenesCMRDataset /
NuScenesLargeRangeDataset — the full offline->online round trip the
reference runs via gen_maps_our.py + nuscenes_loader_cmr.py.
"""

import os
import pickle

import numpy as np
import pytest

from i2pnet_tpu.data import preprocess_nuscenes as PN


class StubNuScenes:
    """Minimal devkit stand-in: token-keyed tables + dataroot."""

    def __init__(self, dataroot, tables):
        self.dataroot = dataroot
        self._tables = tables
        self.scene = tables["scene_list"]

    def get(self, table, token):
        return self._tables[table][token]


def _quat_identity():
    return [1.0, 0.0, 0.0, 0.0]


@pytest.fixture(scope="module")
def stub_nusc(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc_raw")
    rng = np.random.default_rng(0)
    tables = {
        "scene_list": [],
        "scene": {},
        "sample": {},
        "sample_data": {},
        "ego_pose": {},
        "calibrated_sensor": {},
    }

    (root / "sweeps").mkdir()
    (root / "cams").mkdir()
    from PIL import Image

    def add_scene(name, description, n_frames):
        lidar_tokens = [f"{name}_L{i}" for i in range(n_frames)]
        for i, tok in enumerate(lidar_tokens):
            # sweep file: float32 (x, y, z, intensity, ring) rows
            pts = rng.uniform(-8, 8, size=(500, 3)).astype(np.float32)
            pts[:40, 0] = rng.uniform(-0.5, 0.5, 40)  # ego-vehicle returns
            pts[:40, 1] = rng.uniform(-2.0, 2.0, 40)
            raw = np.concatenate(
                [pts, rng.uniform(0, 1, (500, 1)).astype(np.float32),
                 np.zeros((500, 1), np.float32)], 1,
            )
            raw.tofile(root / "sweeps" / f"{tok}.pcd.bin")

            img = Image.fromarray(
                rng.integers(0, 255, size=(200, 300, 3), dtype=np.uint8)
            )
            img.save(root / "cams" / f"{name}_C{i}.jpg")

            tables["ego_pose"][f"ep_{tok}"] = {
                "rotation": _quat_identity(),
                "translation": [float(i) * 0.5, 0.0, 0.0],
            }
            tables["calibrated_sensor"][f"cs_{tok}"] = {
                "rotation": _quat_identity(),
                "translation": [0.0, 0.0, 1.8],
            }
            tables["ego_pose"][f"ep_{name}_C{i}"] = {
                "rotation": _quat_identity(),
                "translation": [float(i) * 0.5 + 0.1, 0.0, 0.0],
            }
            tables["calibrated_sensor"][f"cs_{name}_C{i}"] = {
                "rotation": _quat_identity(),
                "translation": [0.0, 0.0, 1.5],
                "camera_intrinsic": [[120.0, 0.0, 150.0],
                                     [0.0, 120.0, 100.0],
                                     [0.0, 0.0, 1.0]],
            }
            sample_tok = f"{name}_S{i}"
            cam_tok = f"{name}_C{i}"
            tables["sample"][sample_tok] = {
                "token": sample_tok,
                "data": {"LIDAR_TOP": tok,
                         **{c: cam_tok for c in PN.CAM_LIST}},
            }
            tables["sample_data"][tok] = {
                "token": tok,
                "sample_token": sample_tok,
                "ego_pose_token": f"ep_{tok}",
                "calibrated_sensor_token": f"cs_{tok}",
                "filename": f"sweeps/{tok}.pcd.bin",
                "next": lidar_tokens[i + 1] if i + 1 < n_frames else "",
            }
            tables["sample_data"][cam_tok] = {
                "token": cam_tok,
                "sample_token": sample_tok,
                "ego_pose_token": f"ep_{name}_C{i}",
                "calibrated_sensor_token": f"cs_{name}_C{i}",
                "filename": f"cams/{name}_C{i}.jpg",
                "next": "", "prev": "",
            }
        scene = {
            "token": f"scene_{name}",
            "name": name,
            "description": description,
            "first_sample_token": f"{name}_S0",
        }
        tables["scene"][scene["token"]] = scene
        tables["scene_list"].append(scene)

    add_scene("day0", "sunny drive", 4)
    add_scene("night0", "Night drive", 4)
    return StubNuScenes(str(root), tables)


def test_voxel_down_sample_averages_cells():
    pts = np.array([[0.01, 0.01, 0.01], [0.04, 0.04, 0.04], [1.0, 1.0, 1.0]])
    attrs = np.array([1.0, 3.0, 5.0])
    out, a = PN.voxel_down_sample(pts, attrs, 0.1)
    assert out.shape == (2, 3) and a.shape == (2, 1)
    got = {tuple(np.round(p, 3)) for p in out}
    assert (0.025, 0.025, 0.025) in got and (1.0, 1.0, 1.0) in got
    assert sorted(a[:, 0]) == [2.0, 5.0]


def test_outlier_removal_drops_far_point():
    rng = np.random.default_rng(0)
    cloud = rng.normal(size=(300, 3)) * 0.5
    cloud = np.concatenate([cloud, [[50.0, 50.0, 50.0]]], 0)
    keep = PN.remove_statistical_outliers(cloud, nb_neighbors=20, std_ratio=1.0)
    assert not keep[-1]
    assert keep[:-1].mean() > 0.8


def test_daytime_filter_and_lidar_tokens(stub_nusc):
    tokens, names = PN.daytime_scenes(stub_nusc, (0, 10))
    assert names == ["day0"]  # night scene filtered by description
    lt = PN.get_scene_lidar_tokens(stub_nusc, tokens[0], frame_skip=2)
    # 4 chained sweeps at skip 2 -> first + counters 2 and 4
    assert lt == ["day0_L0", "day0_L1", "day0_L3"]


def test_dataset_info_covers_all_cameras(stub_nusc):
    info = PN.make_dataset_info(stub_nusc, frame_skip=2)
    assert len(info) == 3  # day scene's kept sweeps only
    lidar_token, cams = info[0]
    assert lidar_token == "day0_L0"
    assert set(cams.keys()) == set(PN.CAM_LIST)
    assert all(len(v) >= 1 for v in cams.values())


def test_generate_split_roundtrip_with_loaders(stub_nusc, tmp_path):
    out = str(tmp_path / "nus_processed")
    path, n = PN.generate_split(
        stub_nusc, out, (0, 10), 1, "train_dataset_map_small_short.list",
        seed=0, voxel_size=0.2,
    )
    assert n == 3
    with open(path, "rb") as f:
        entries = pickle.load(f)
    (h5_rel, cam_rel), K, velo2cam2, extra = entries[0]
    assert os.path.exists(os.path.join(out, h5_rel))
    assert np.asarray(K).shape == (3, 3)
    assert np.asarray(velo2cam2).shape == (4, 4)
    assert extra[-1] == "day0"

    import h5py

    with h5py.File(os.path.join(out, h5_rel), "r") as hf:
        pc = np.asarray(hf["PC"])
        inten = np.asarray(hf["intensity"])
    assert pc.dtype == np.float16 and pc.shape[0] == 4
    assert inten.shape == (1, pc.shape[1])
    # local-map crop box (ref gen_maps_our.py:361-366)
    assert pc[0].astype(np.float32).min() > -10.0 - 0.1
    assert pc[0].astype(np.float32).max() < 10.0 + 0.1
    assert pc[1].astype(np.float32).min() > -5.0 - 0.1
    assert pc[1].astype(np.float32).max() < 15.0 + 0.1

    # the camera images live under the RAW tree, the maps under the
    # processed tree; symlink the raw dirs in (the reference points its
    # loaders at a tree containing both)
    for d in ("cams", "sweeps"):
        os.symlink(os.path.join(stub_nusc.dataroot, d), os.path.join(out, d))

    from i2pnet_tpu.data import NuScenesCMRDataset, NuScenesLargeRangeDataset

    ds = NuScenesCMRDataset(out, [path], mode="train", img_H=64, img_W=128,
                            sample_point=512, seed=0)
    s = ds[0]
    assert s["rgb"].shape == (64, 128, 3)
    assert s["lidar"].shape == (512, 3)
    assert np.isfinite(s["lidar"]).all()
    assert abs(np.linalg.norm(s["decalib_real_gt"]) - 1.0) < 1e-5

    ds2 = NuScenesLargeRangeDataset(out, [path], mode="train", img_H=16,
                                    img_W=64, sample_point=1000, seed=0)
    s2 = ds2[0]
    assert s2["rgb"].shape == (16, 64, 3)
    assert s2["lidar"].shape == (1000, 3)
    assert s2["lidar_feats"].shape == (1000, 1)
