"""CLI subprocess smoke tests (slow-gated).

tests/test_harness.py drives the Trainer/Evaluator CLASSES; nothing before
round 4 executed `train.py` / `evaluate.py` as real subprocesses, so argparse
wiring (flag renames, --efgh, --accum_steps, multi---model_dir cascade) could
silently rot. The reference's only entry points are its CLIs
(ref /root/reference/train20v2learn_wandb.py:24-51, evaluation_cmr.py:156-175);
these tests run ours end-to-end against tiny synthetic on-disk fixtures:

  * kd_cmr_snr  (free-point): train 1 epoch -> evaluate with a TWO-stage
    cascade (--model_dir A A) + --analyze -> prediction.txt + metrics npz.
  * kd_corr_nolidar (projection): train 1 epoch -> evaluate.
  * kitti --efgh (online calibration): train 1 epoch with the per-sample
    projection matrix threaded, --accum_steps 2 -> evaluate --efgh.

Each subprocess runs on CPU (honor_jax_platforms_env) with the shared
CPU-only persistent compile cache.
"""

import json
import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    "not config.getoption('--run-slow', default=False)",
    reason="needs --run-slow",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CALIB_TXT = """P0: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0
P2: 700.0 0.0 600.0 44.8 0.0 700.0 180.0 0.2 0.0 0.0 1.0 0.003
Tr: 0.0 -1.0 0.0 0.01 0.0 0.0 -1.0 -0.05 1.0 0.0 0.0 -0.3
"""


def _run_cli(script, argv, timeout=1500, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_i2pnet"
    env.update(extra_env or {})
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + argv,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert out.returncode == 0, (
        f"{script} {' '.join(argv)}\n--- stdout ---\n{out.stdout[-4000:]}"
        f"\n--- stderr ---\n{out.stderr[-4000:]}"
    )
    return out


def _make_cmr_root(root, seqs=(0, 3), frames=3):
    rng = np.random.default_rng(0)
    for seq in seqs:
        seq_dir = root / "kitti_processed_CMRNet" / "sequences" / ("%02d" % seq)
        (seq_dir / "local_maps").mkdir(parents=True)
        (seq_dir / "image_2_npy").mkdir(parents=True)
        (seq_dir / "calib.txt").write_text(CALIB_TXT)
        for fi in range(frames):
            pc = rng.uniform(-20, 20, size=(3, 500)).astype(np.float32)
            inten = rng.uniform(0, 1, size=(1, 500)).astype(np.float32)
            with h5py.File(seq_dir / "local_maps" / ("%06d.h5" % fi), "w") as hf:
                hf["PC"] = np.vstack([pc, np.ones((1, 500), np.float32)])
                hf["intensity"] = inten
            img = rng.integers(0, 255, size=(376, 1241, 3), dtype=np.uint8)
            np.save(seq_dir / "image_2_npy" / ("%06d.npy" % fi), img)
    return str(root)


def _make_large_root(root, seqs=(7, 9), frames=2):
    # seq 7 is in BOTH the DeepI2P train (0-8) and test (7, 8) splits, so
    # one fixture sequence feeds train.py and evaluate.py; seq 9 fills the
    # val split train.py always builds for this dataset
    rng = np.random.default_rng(1)
    for seq in seqs:
        seq_dir = (
            root / "kitti_processed_DeepI2P" / "data_odometry_velodyne"
            / "sequences" / ("%02d" % seq)
        )
        (seq_dir / "voxel0.1-SNr0.6").mkdir(parents=True)
        (seq_dir / "image_2_npy").mkdir(parents=True)
        (seq_dir / "calib.txt").write_text(CALIB_TXT)
        for fi in range(frames):
            n = 800
            data = np.zeros((7, n), np.float32)
            data[0:3] = rng.uniform(-40, 40, size=(3, n))
            data[3] = rng.uniform(0, 1, size=n)
            data[4:7] = rng.normal(size=(3, n))
            np.save(seq_dir / "voxel0.1-SNr0.6" / ("%06d.npy" % fi), data)
            img = rng.integers(0, 255, size=(376, 1241, 3), dtype=np.uint8)
            np.save(seq_dir / "image_2_npy" / ("%06d.npy" % fi), img)
    return str(root)


def _make_raw_root(root, date_drives=(("2011_09_26", 1), ("2011_09_30", 28)),
                   frames=2):
    # drive 1 is a RAW_TRAIN_DRIVES_2011_09_26 entry (train.py); 2011_09_30
    # drive 28 is the KITTI_ONLINE_CALIB['test'] protocol drive (evaluate.py)
    import cv2

    rng = np.random.default_rng(4)
    for date, drive in date_drives:
        drive_dir = root / date / f"{date}_drive_{drive:04d}_sync"
        (drive_dir / "image_02" / "data").mkdir(parents=True)
        (drive_dir / "velodyne_points" / "data").mkdir(parents=True)
        for i in range(frames):
            img = rng.integers(0, 255, size=(375, 1242, 3), dtype=np.uint8)
            cv2.imwrite(str(drive_dir / "image_02" / "data" / f"{i:010d}.png"),
                        img)
            pts = rng.uniform(2, 50, size=(9000, 4)).astype(np.float32)
            pts.tofile(drive_dir / "velodyne_points" / "data" / f"{i:010d}.bin")
    return str(root)


def test_cli_train_eval_cascade_cmr(tmp_path):
    root = _make_cmr_root(tmp_path / "data")
    log = str(tmp_path / "log")
    _run_cli("train.py", [
        "--dataset", "kd_cmr_snr", "--network", "i2pnet", "--tiny",
        "--root_path", root, "--log_dir", log, "--max_epoch", "1",
        "--batch_size", "1", "--save_rate", "1", "--num_workers", "0",
    ])
    assert os.path.exists(os.path.join(log, "config.json"))

    info = str(tmp_path / "info_test")
    # TWO --model_dir entries = the reference's two-stage cascade protocol
    # (evaluation_cmr.py: coarse stage re-warps the cloud for the next);
    # --vis_rate exercises the eval-time projection-image fan-out
    # (ref evaluation.py:630-657 add_image calls)
    _run_cli("evaluate.py", [
        "--dataset", "kd_cmr_snr", "--network", "i2pnet", "--tiny",
        "--root_path", root, "--model_dir", log, log,
        "--log_dir", info, "--batch_size", "1", "--analyze",
        "--vis_rate", "2",
    ])
    assert os.path.exists(os.path.join(info, "prediction.txt"))
    # the vis hook attached a UniWriter: TB event file in the eval log dir
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(info)), (
        os.listdir(info))
    npz = [f for f in os.listdir(info) if f.endswith(".npz")]
    assert npz, os.listdir(info)
    from i2pnet_tpu.eval.analysis import parse_prediction_file

    mats = parse_prediction_file(os.path.join(info, "prediction.txt"))
    assert mats["pred"].shape[0] == 3  # test seq 0 has 3 frames


def test_cli_train_eval_proj(tmp_path):
    root = _make_large_root(tmp_path / "data")
    log = str(tmp_path / "log")
    _run_cli("train.py", [
        "--dataset", "kd_corr_nolidar", "--network", "i2pnet_proj", "--tiny",
        "--root_path", root, "--log_dir", log, "--max_epoch", "1",
        "--batch_size", "1", "--save_rate", "1",
    ])
    info = str(tmp_path / "info_test")
    # --dp: multi-device eval fan-out over the 8 virtual CPU devices
    # (Evaluator(mesh=...); batch 1 over 8 devices exercises the
    # ragged-batch pad+trim path end-to-end through the CLI)
    _run_cli("evaluate.py", [
        "--dataset", "kd_corr_nolidar", "--network", "i2pnet_proj", "--tiny",
        "--root_path", root, "--model_dir", log,
        "--log_dir", info, "--batch_size", "1", "--dp",
    ], extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    assert os.path.exists(os.path.join(info, "prediction.txt"))


def test_cli_train_eval_efgh(tmp_path):
    root = _make_raw_root(tmp_path / "data")
    log = str(tmp_path / "log")
    _run_cli("train.py", [
        "--dataset", "kitti", "--network", "i2pnet", "--efgh", "--tiny",
        "--root_path", root, "--log_dir", log, "--max_epoch", "1",
        "--batch_size", "2", "--save_rate", "1", "--accum_steps", "2",
    ])
    # the resolved model config must record the efgh variant
    with open(os.path.join(log, "config.json")) as f:
        cfg = json.load(f)
    assert str(cfg["config"]["efgh"]).lower() == "true", cfg["config"]

    info = str(tmp_path / "info_test")
    _run_cli("evaluate.py", [
        "--dataset", "kitti", "--network", "i2pnet", "--efgh", "--tiny",
        "--root_path", root, "--model_dir", log,
        "--log_dir", info, "--batch_size", "1",
    ])
    assert os.path.exists(os.path.join(info, "prediction.txt"))
