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


# ---------------------------------------------------------------------------
# Real-format fixture: actual v1.0 JSON tables on disk, read by NuScenesLite
# ---------------------------------------------------------------------------


def _wxyz(rot) -> list:
    """scipy Rotation -> schema-order [w, x, y, z] quaternion list."""
    x, y, z, w = rot.as_quat()
    return [float(w), float(x), float(y), float(z)]


def _P_from_record(rec: dict) -> np.ndarray:
    """Independent oracle: 4x4 pose from a raw table record, decoding the
    schema's [w,x,y,z] rotation with scipy (NOT the code under test)."""
    from scipy.spatial.transform import Rotation

    q = rec["rotation"]
    R = Rotation.from_quat([q[1], q[2], q[3], q[0]]).as_matrix()
    P = np.eye(4)
    P[:3, :3] = R
    P[:3, 3] = rec["translation"]
    return P


@pytest.fixture(scope="module")
def json_nusc(tmp_path_factory):
    """On-disk nuScenes v1.0 fixture: real JSON table schema (wxyz
    rotations, is_key_frame, prev/next chains, sensor/log tables, real
    file layout) with NON-identity rotations so a quaternion-order misread
    cannot hide, plus intermediate non-key-frame sweeps so the devkit's
    key-frame-only reverse index is exercised."""
    import json as jsonlib

    from PIL import Image
    from scipy.spatial.transform import Rotation

    root = tmp_path_factory.mktemp("nusc_json")
    (root / "samples" / "LIDAR_TOP").mkdir(parents=True)
    (root / "sweeps" / "LIDAR_TOP").mkdir(parents=True)
    (root / "samples" / "CAM_FRONT").mkdir(parents=True)
    tdir = root / "v1.0-trainval"
    tdir.mkdir()

    rng = np.random.default_rng(7)
    yaw = Rotation.from_euler("z", 0.3)
    lidar_cs_rot = Rotation.identity()
    # front camera mount: cam x=right, y=down, z=forward in an ego frame
    # with x=forward, y=left, z=up
    cam_cs_R = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    cam_cs_rot = Rotation.from_matrix(cam_cs_R)

    sensors = [
        {"token": "sen_lidar", "channel": "LIDAR_TOP", "modality": "lidar"},
    ]
    from i2pnet_tpu.data import preprocess_nuscenes as PNmod

    for c in PNmod.CAM_LIST:
        sensors.append({"token": f"sen_{c}", "channel": c, "modality": "camera"})
    logs = [{"token": "log0", "logfile": "n008", "vehicle": "n008",
             "date_captured": "2018-08-01", "location": "boston-seaport"}]

    scenes, samples, sample_datas, ego_poses, calib_sensors = [], [], [], [], []
    marker = np.array([6.5, 5.0, 2.0], np.float32)

    def write_sweep(path, include_marker):
        pts = rng.uniform([-8, -8, -1], [4, 8, 3], size=(500, 3)).astype(np.float32)
        pts[:40, 0] = rng.uniform(-0.5, 0.5, 40)  # ego returns (filtered)
        pts[:40, 1] = rng.uniform(-2.0, 2.0, 40)
        if include_marker:
            # a CLUSTER bigger than the outlier filter's 40-NN window so
            # the map keeps it (an isolated point would be dropped by
            # design)
            pts[-150:] = marker + rng.normal(0, 0.25, size=(150, 3)).astype(
                np.float32)
        raw = np.concatenate(
            [pts, rng.uniform(0, 1, (500, 1)).astype(np.float32),
             np.zeros((500, 1), np.float32)], 1)
        raw.astype(np.float32).tofile(path)

    def add_scene(name, description, night=False):
        n_key = 4
        t0 = 1_533_100_000_000_000
        key_lidar = [f"{name}_L{i}" for i in range(n_key)]
        mid_lidar = [f"{name}_M{i}" for i in range(n_key - 1)]
        chain = []
        for i in range(n_key):
            chain.append(key_lidar[i])
            if i < n_key - 1:
                chain.append(mid_lidar[i])
        for i in range(n_key):
            samples.append({
                "token": f"{name}_S{i}",
                "timestamp": t0 + i * 500_000,
                "prev": f"{name}_S{i-1}" if i else "",
                "next": f"{name}_S{i+1}" if i + 1 < n_key else "",
                "scene_token": f"scene_{name}",
            })
        for j, tok in enumerate(chain):
            is_key = tok in key_lidar
            i_key = int(tok[len(name) + 2:])
            # non-key sweep associated with the NEXT keyframe's sample,
            # like real data
            sample_tok = (f"{name}_S{i_key}" if is_key
                          else f"{name}_S{i_key + 1}")
            x = 0.25 * j  # ego marches in world x
            ego_poses.append({
                "token": f"ep_{tok}",
                "timestamp": t0 + j * 250_000,
                "rotation": _wxyz(yaw),
                "translation": [x, 0.0, 0.0],
            })
            calib_sensors.append({
                "token": f"cs_{tok}",
                "sensor_token": "sen_lidar",
                "translation": [0.0, 0.0, 1.8],
                "rotation": _wxyz(lidar_cs_rot),
                "camera_intrinsic": [],
            })
            sub = "samples" if is_key else "sweeps"
            fn = f"{sub}/LIDAR_TOP/{tok}.pcd.bin"
            write_sweep(root / fn, include_marker=(tok == f"{name}_M0"))
            sample_datas.append({
                "token": tok,
                "sample_token": sample_tok,
                "ego_pose_token": f"ep_{tok}",
                "calibrated_sensor_token": f"cs_{tok}",
                "timestamp": t0 + j * 250_000,
                "fileformat": "pcd",
                "is_key_frame": is_key,
                "height": 0,
                "width": 0,
                "filename": fn,
                "prev": chain[j - 1] if j else "",
                "next": chain[j + 1] if j + 1 < len(chain) else "",
            })
        for c in PNmod.CAM_LIST:
            for i in range(n_key):
                tok = f"{name}_{c}_{i}"
                ego_poses.append({
                    "token": f"ep_{tok}",
                    "timestamp": t0 + i * 500_000 + 20_000,
                    "rotation": _wxyz(yaw),
                    "translation": [0.5 * i + 0.1, 0.0, 0.0],
                })
                calib_sensors.append({
                    "token": f"cs_{tok}",
                    "sensor_token": f"sen_{c}",
                    "translation": [1.5, 0.0, 1.5],
                    "rotation": _wxyz(cam_cs_rot),
                    "camera_intrinsic": [[120.0, 0.0, 150.0],
                                         [0.0, 120.0, 100.0],
                                         [0.0, 0.0, 1.0]],
                })
                fn = f"samples/CAM_FRONT/{tok}.jpg"
                Image.fromarray(rng.integers(
                    0, 255, size=(200, 300, 3), dtype=np.uint8)).save(root / fn)
                sample_datas.append({
                    "token": tok,
                    "sample_token": f"{name}_S{i}",
                    "ego_pose_token": f"ep_{tok}",
                    "calibrated_sensor_token": f"cs_{tok}",
                    "timestamp": t0 + i * 500_000 + 20_000,
                    "fileformat": "jpg",
                    "is_key_frame": True,
                    "height": 200,
                    "width": 300,
                    "filename": fn,
                    "prev": f"{name}_{c}_{i-1}" if i else "",
                    "next": f"{name}_{c}_{i+1}" if i + 1 < n_key else "",
                })
        scenes.append({
            "token": f"scene_{name}",
            "log_token": "log0",
            "nbr_samples": n_key,
            "first_sample_token": f"{name}_S0",
            "last_sample_token": f"{name}_S{n_key-1}",
            "name": name,
            "description": description,
        })

    add_scene("scene-0001", "Parked truck, sunny")
    add_scene("scene-0002", "Night drive, empty road")

    tables = {
        "scene": scenes, "sample": samples, "sample_data": sample_datas,
        "ego_pose": ego_poses, "calibrated_sensor": calib_sensors,
        "sensor": sensors, "log": logs,
    }
    for name, records in tables.items():
        with open(tdir / f"{name}.json", "w") as f:
            jsonlib.dump(records, f)
    return str(root), marker


def test_nuscenes_lite_reverse_index(json_nusc):
    from i2pnet_tpu.data.nuscenes_lite import NuScenesLite

    root, _ = json_nusc
    nusc = NuScenesLite(root, version="v1.0-trainval")
    assert [s["name"] for s in nusc.scene] == ["scene-0001", "scene-0002"]
    s0 = nusc.get("sample", "scene-0001_S0")
    # key frames only in the reverse index
    assert s0["data"]["LIDAR_TOP"] == "scene-0001_L0"
    assert set(PN.CAM_LIST) <= set(s0["data"].keys())
    # non-key sweeps never appear in any sample's data map
    for s in nusc._lists["sample"]:
        assert not any(t.startswith("scene-0001_M") for t in s["data"].values())
    sd = nusc.get("sample_data", "scene-0001_M0")
    assert sd["channel"] == "LIDAR_TOP" and sd["sensor_modality"] == "lidar"
    # devkit semantics: the sweep chain interleaves key and non-key frames
    toks = PN.get_scene_lidar_tokens(nusc, "scene_scene-0001", frame_skip=2)
    assert toks == ["scene-0001_L0", "scene-0001_M0", "scene-0001_M1",
                    "scene-0001_M2"]


def test_real_schema_roundtrip_geometry_and_loaders(json_nusc, tmp_path):
    """End-to-end over the REAL table format with non-identity rotations:
    a [w,x,y,z] vs [x,y,z,w] misread (or any pose-chain error) moves the
    cross-frame marker / breaks the velo2cam2 oracle."""
    import pickle

    from i2pnet_tpu.data.nuscenes_lite import NuScenesLite

    root, marker = json_nusc
    nusc = NuScenesLite(root, version="v1.0-trainval")
    tokens, names = PN.daytime_scenes(nusc, (0, 10))
    assert names == ["scene-0001"]  # night filtered from the real tables

    out = str(tmp_path / "nus_processed")
    path, n = PN.generate_split(
        nusc, out, (0, 10), 1, "train_dataset_map_small_short.list",
        seed=0, voxel_size=0.2,
    )
    assert n == 4
    with open(path, "rb") as f:
        entries = pickle.load(f)

    # --- velo2cam2 oracle from the raw JSON records via scipy
    (h5_rel, cam_rel), K, velo2cam2, extra = entries[0]
    cam_tok = os.path.basename(cam_rel)[:-4]
    sd_cam = nusc.get("sample_data", cam_tok)
    sd_near = nusc.get(
        "sample_data",
        nusc.get("sample", sd_cam["sample_token"])["data"]["LIDAR_TOP"],
    )
    P_cam = _P_from_record(nusc.get("ego_pose", sd_cam["ego_pose_token"]))
    CP_cam = _P_from_record(
        nusc.get("calibrated_sensor", sd_cam["calibrated_sensor_token"]))
    P_nl = _P_from_record(nusc.get("ego_pose", sd_near["ego_pose_token"]))
    CP_nl = _P_from_record(
        nusc.get("calibrated_sensor", sd_near["calibrated_sensor_token"]))
    want = np.linalg.inv(CP_cam) @ np.linalg.inv(P_cam) @ (P_nl @ CP_nl)
    np.testing.assert_allclose(np.asarray(velo2cam2), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(K)[0, 0], 120.0)

    # --- cross-frame marker: M0's marker must appear in frame 0's local
    # map exactly where inv(world_from_L0) @ world_from_M0 puts it
    import h5py

    with h5py.File(os.path.join(out, h5_rel), "r") as hf:
        pc0 = np.asarray(hf["PC"]).astype(np.float32)[:3].T  # (N, 3)
    sd_m0 = nusc.get("sample_data", "scene-0001_M0")
    sd_l0 = nusc.get("sample_data", "scene-0001_L0")

    def world_P(sd):
        return _P_from_record(
            nusc.get("ego_pose", sd["ego_pose_token"])
        ) @ _P_from_record(
            nusc.get("calibrated_sensor", sd["calibrated_sensor_token"]))

    rel = np.linalg.inv(world_P(sd_l0)) @ world_P(sd_m0)
    expect = rel[:3, :3] @ marker + rel[:3, 3]
    d = np.linalg.norm(pc0 - expect, axis=1)
    assert d.min() < 0.35, f"marker not found near {expect} (min d {d.min()})"
    # the marker region (x ~ 6.5, away from the x <= 4 bulk) is otherwise
    # empty, so only the cluster can match
    assert (d < 1.0).sum() >= 3

    # --- loaders consume the generated split
    for dirn in ("samples", "sweeps"):
        os.symlink(os.path.join(root, dirn), os.path.join(out, dirn))
    from i2pnet_tpu.data import NuScenesCMRDataset

    ds = NuScenesCMRDataset(out, [path], mode="train", img_H=64, img_W=128,
                            sample_point=512, seed=0)
    s = ds[0]
    assert s["rgb"].shape == (64, 128, 3)
    assert s["lidar"].shape == (512, 3)
    assert np.isfinite(s["lidar"]).all()
