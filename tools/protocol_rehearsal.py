#!/usr/bin/env python
"""Full-protocol rehearsal: synthetic data -> train.py -> checkpoint ->
evaluate.py -> prediction.txt + metrics npz -> analysis, for BOTH families.

This is the closest no-real-dataset proxy for the reference's headline
protocol (ref evaluation_proj.py:356-405 / evaluation_cmr.py:156-175): it
exercises the complete artifact chain through the REAL CLIs, with data that
is geometrically consistent — each image is a depth-shaded splat of the
frame's point cloud through the on-disk calib at the ground-truth pose, so
the eval RTE/RRE can only drop if the full train->checkpoint->eval chain
actually works (random fixtures could never show that).

Disk layouts are the real protocol layouts:
  * kd_cmr_snr:       kitti_processed_CMRNet/sequences/%02d/{local_maps/*.h5,
                      image_2_npy/*.npy, calib.txt} (ref kitti_odometry_cmr.py:414-440)
  * kd_corr_nolidar:  kitti_processed_DeepI2P/data_odometry_velodyne/sequences/
                      %02d/{voxel0.1-SNr0.6/*.npy, image_2_npy, calib.txt}
                      (ref kitti_odometry_corr_lidarnone_proj.py:519-543)

Geometry: the loaders compute pc_cam = (P2_fold @ Tr) @ p_disk and project it
through the parsed intrinsic (data/calib.py read_calib), so we sample points
directly in the camera frustum (below the loaders' crop_top=50 row), splat
the full-resolution image through the same intrinsic, and store
p_disk = Pc^-1 @ p_cam.

Usage (TPU; ~15-25 min for both families):
  python tools/protocol_rehearsal.py --workdir /tmp/rehearsal \
      [--families cmr,proj] [--max_epoch 20] [--frames 120]
Prints one JSON summary line per family with the protocol RTE/RRE.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Same calib as the CLI smoke fixtures: fx=fy=700, cx=600, cy=180 fits the
# raw 376x1241 KITTI image; Tr is the canonical velo(x fwd) -> cam(z fwd)
# axis permutation with a small offset.
CALIB_TXT = """P0: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0
P2: 700.0 0.0 600.0 44.8 0.0 700.0 180.0 0.2 0.0 0.0 1.0 0.003
Tr: 0.0 -1.0 0.0 0.01 0.0 0.0 -1.0 -0.05 1.0 0.0 0.0 -0.3
"""
IMG_H_RAW, IMG_W_RAW = 376, 1241
CROP_TOP = 50


def _calib_mats(tmp):
    from i2pnet_tpu.data.calib import read_calib

    path = os.path.join(tmp, "_calib.txt")
    with open(path, "w") as f:
        f.write(CALIB_TXT)
    Tr, K, P = read_calib(path)
    Tr4 = np.vstack([Tr, [0, 0, 0, 1]])
    Pc4 = P @ Tr4
    return K.astype(np.float64), Pc4.astype(np.float64)


def make_frame(rng, K, Pc4, n_points, z_range=(4.0, 45.0)):
    """One consistent (velo-frame cloud, full-res uint8 image) pair.

    Points are sampled uniformly in PIXEL space (below the crop row) and in
    depth, so every point projects into the visible image; the image is the
    depth-shaded splat of exactly those points.
    """
    u = rng.uniform(2, IMG_W_RAW - 2, n_points)
    v = rng.uniform(CROP_TOP + 4, IMG_H_RAW - 2, n_points)
    z = rng.uniform(*z_range, n_points)
    pix = np.stack([u * z, v * z, z], axis=0)  # (3,N) homogeneous*z
    p_cam = np.linalg.solve(K, pix)  # (3,N) camera frame
    p_h = np.vstack([p_cam, np.ones((1, n_points))])
    p_disk = np.linalg.solve(Pc4, p_h)[:3]  # (3,N) velo/map frame

    img = np.zeros((IMG_H_RAW, IMG_W_RAW, 3), np.uint8)
    # clip low at 8 so even the farthest splat is a LIT pixel (the
    # consistency tests assert every reprojection hits one)
    shade = np.clip(
        255.0 * (1.0 - (z - z_range[0]) / (z_range[1] - z_range[0])), 8, 255
    ).astype(np.uint8)
    # round-to-nearest to match reprojection (floor would shift the splat
    # half a pixel against K @ p / z)
    ui, vi = np.rint(u).astype(np.int64), np.rint(v).astype(np.int64)
    img[vi, ui] = shade[:, None]
    return p_disk.astype(np.float32), img


def gen_cmr_root(root, rng, frames_train=120, frames_test=32, n_points=10000):
    import h5py

    K, Pc4 = _calib_mats(root)
    for seq, n_frames in ((3, frames_train), (5, frames_train), (0, frames_test)):
        seq_dir = os.path.join(
            root, "kitti_processed_CMRNet", "sequences", "%02d" % seq
        )
        os.makedirs(os.path.join(seq_dir, "local_maps"), exist_ok=True)
        os.makedirs(os.path.join(seq_dir, "image_2_npy"), exist_ok=True)
        with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
            f.write(CALIB_TXT)
        for fi in range(n_frames):
            pc, img = make_frame(rng, K, Pc4, n_points)
            with h5py.File(
                os.path.join(seq_dir, "local_maps", "%06d.h5" % fi), "w"
            ) as hf:
                hf["PC"] = np.vstack([pc, np.ones((1, pc.shape[1]), np.float32)])
                hf["intensity"] = rng.uniform(
                    0, 1, (1, pc.shape[1])
                ).astype(np.float32)
            np.save(os.path.join(seq_dir, "image_2_npy", "%06d.npy" % fi), img)
    return root


def gen_large_root(root, rng, frames_train=60, frames_eval=12, n_points=40000):
    K, Pc4 = _calib_mats(root)
    # train seqs 0-1; test protocol seqs 7-8; val seq 9 (train.py builds it)
    plan = ((0, frames_train), (1, frames_train), (7, frames_eval),
            (8, frames_eval), (9, frames_eval))
    for seq, n_frames in plan:
        seq_dir = os.path.join(
            root, "kitti_processed_DeepI2P", "data_odometry_velodyne",
            "sequences", "%02d" % seq,
        )
        os.makedirs(os.path.join(seq_dir, "voxel0.1-SNr0.6"), exist_ok=True)
        os.makedirs(os.path.join(seq_dir, "image_2_npy"), exist_ok=True)
        with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
            f.write(CALIB_TXT)
        for fi in range(n_frames):
            pc, img = make_frame(rng, K, Pc4, n_points)
            sn = rng.normal(size=(3, n_points)).astype(np.float32)
            sn /= np.linalg.norm(sn, axis=0, keepdims=True) + 1e-9
            data = np.vstack([
                pc,
                rng.uniform(0, 1, (1, n_points)).astype(np.float32),
                sn,
            ]).astype(np.float32)
            np.save(os.path.join(seq_dir, "voxel0.1-SNr0.6", "%06d.npy" % fi),
                    data)
            np.save(os.path.join(seq_dir, "image_2_npy", "%06d.npy" % fi), img)
    return root


def _run(script, argv, log_path, timeout=7200):
    cmd = [sys.executable, "-u", os.path.join(REPO, script)] + argv
    env = dict(os.environ)
    # persistent compile cache for the CLI subprocesses (jax honors the env
    # var): the big exact-KNN eval executable compiles once per box, not
    # once per rehearsal. Keyed per backend — never share CPU/axon caches.
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_i2pnet_cli")
    with open(log_path, "a") as lf:
        lf.write("\n$ " + " ".join(cmd) + "\n")
        lf.flush()
        rc = subprocess.run(
            cmd, stdout=lf, stderr=subprocess.STDOUT, timeout=timeout,
            cwd=REPO, env=env,
        ).returncode
    if rc != 0:
        tail = open(log_path).read()[-3000:]
        raise SystemExit(f"{script} failed rc={rc}\n{tail}")


def _summarize(info_dir):
    """Protocol metrics from the evaluation artifacts."""
    out = {}
    npzs = [f for f in sorted(os.listdir(info_dir)) if f.endswith(".npz")]
    if npzs:
        z = np.load(os.path.join(info_dir, npzs[-1]))
        for k in z.files:
            a = np.asarray(z[k])
            if a.ndim == 1 and a.size and a.dtype.kind == "f":
                out[f"mean_{k}"] = round(float(np.mean(a)), 3)
    pred = os.path.join(info_dir, "prediction.txt")
    if os.path.exists(pred):
        from i2pnet_tpu.eval.analysis import parse_prediction_file

        mats = parse_prediction_file(pred)
        out["n_eval"] = int(mats["pred"].shape[0])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/rehearsal")
    ap.add_argument("--families", default="cmr,proj")
    ap.add_argument("--max_epoch", type=int, default=20)
    ap.add_argument("--frames", type=int, default=120,
                    help="train frames per sequence")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_gen", action="store_true",
                    help="reuse an existing --workdir dataset")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    fams = args.families.split(",")

    for fam in fams:
        fam_dir = os.path.join(args.workdir, fam)
        data, log_dir = os.path.join(fam_dir, "data"), os.path.join(fam_dir, "log")
        info = os.path.join(fam_dir, "info_test")
        log_path = os.path.join(fam_dir, "run.log")
        os.makedirs(fam_dir, exist_ok=True)
        if not args.skip_gen:
            os.makedirs(data, exist_ok=True)
            if fam == "cmr":
                gen_cmr_root(data, rng, frames_train=args.frames,
                             frames_test=max(4, args.frames // 4))
            else:
                gen_large_root(data, rng, frames_train=args.frames // 2,
                               frames_eval=max(4, args.frames // 10))
            print(json.dumps({"family": fam, "stage": "generated",
                              "root": data}), flush=True)

        ds, net = (("kd_cmr_snr", "i2pnet") if fam == "cmr"
                   else ("kd_corr_nolidar", "i2pnet_proj"))
        _run("train.py", [
            "--dataset", ds, "--network", net, "--root_path", data,
            "--log_dir", log_dir, "--max_epoch", str(args.max_epoch),
            "--batch_size", str(args.batch_size), "--save_rate",
            str(max(1, args.max_epoch // 2)), "--seed", str(args.seed),
        ], log_path)
        print(json.dumps({"family": fam, "stage": "trained",
                          "log": log_dir}), flush=True)

        eval_args = [
            "--dataset", ds, "--network", net, "--root_path", data,
            "--model_dir", log_dir, "--log_dir", info,
            "--batch_size", str(args.batch_size), "--analyze",
        ]
        if fam == "cmr":
            # the reference's two-stage cascade protocol
            eval_args[eval_args.index("--model_dir") + 1:][:0] = []
            i = eval_args.index("--model_dir") + 1
            eval_args.insert(i + 1, log_dir)
        _run("evaluate.py", eval_args, log_path)
        summary = {"family": fam, "stage": "evaluated", **_summarize(info)}
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
