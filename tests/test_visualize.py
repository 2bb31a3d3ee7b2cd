"""Visualization/demo stack tests (error-heat, mask overlay, video, PLY,
depth map) — the capability surface of the reference's vis scripts
(evaluation_vis.py, evaluation_cmr_demo.py, src/visualize.py,
src/dataset.py get_depth_image)."""

import os

import numpy as np

from i2pnet_tpu.eval.visualize import (
    depth_image,
    render_error_heat,
    render_mask_overlay,
    save_ply,
    write_video,
)

RGB = None
PTS = None
E = np.eye(3, 4, dtype=np.float32)
K = np.array([[60.0, 0, 64], [0, 60.0, 32], [0, 0, 1]], np.float32)


def _fixtures():
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 255, size=(64, 128, 3), dtype=np.uint8)
    pts = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    pts[:, 2] += 10
    return rgb, pts


def test_error_heat_zero_error_is_green():
    rgb, pts = _fixtures()
    img = render_error_heat(rgb, pts, E, E, K)
    assert img.shape == rgb.shape
    changed = np.any(img != rgb, axis=-1)
    assert changed.any()
    # identical extrinsics -> zero reprojection error -> pure green splats
    g = img[changed]
    assert (g[:, 1] > 200).all() and (g[:, 0] < 50).all()


def test_error_heat_large_error_is_red():
    rgb, pts = _fixtures()
    E2 = E.copy()
    E2[0, 3] += 8.0  # big x shift -> off-image or large error
    img = render_error_heat(rgb, pts, E2, E, K, max_err_px=5.0)
    changed = np.any(img != rgb, axis=-1)
    px = img[changed]
    # red (large error) and/or blue (frustum-only) must dominate, no green
    assert not ((px[:, 1] > 200) & (px[:, 0] < 50)).any()


def test_mask_overlay_stats_perfect_prediction():
    rgb, pts = _fixtures()
    cam = pts @ E[:, :3].T + E[:, 3]
    uvw = cam @ K.T
    uv = uvw[:, :2] / uvw[:, 2:3]
    gt = (
        (uvw[:, 2] > 0.1)
        & (uv[:, 0] >= 0) & (uv[:, 0] < 128)
        & (uv[:, 1] >= 0) & (uv[:, 1] < 64)
    )
    img, stats = render_mask_overlay(rgb, pts, gt, E, K)
    assert stats["accuracy"] == 1.0
    assert stats["precision"] == 1.0 and stats["recall"] == 1.0

    # flip predictions -> accuracy complements
    img2, stats2 = render_mask_overlay(rgb, pts, ~gt, E, K)
    np.testing.assert_allclose(stats2["accuracy"], 0.0)
    assert stats2["recall"] == 0.0


def test_write_video_and_gif(tmp_path):
    rgb, _ = _fixtures()
    frames = [rgb, 255 - rgb, rgb]
    out = write_video(str(tmp_path / "demo.gif"), frames, fps=5)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    out2 = write_video(str(tmp_path / "demo.mp4"), frames, fps=5)
    assert os.path.exists(out2) and os.path.getsize(out2) > 0


def test_save_ply_roundtrip(tmp_path):
    _, pts = _fixtures()
    p = str(tmp_path / "cloud.ply")
    save_ply(p, pts[:10])
    lines = open(p).read().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex 10" in lines[2]
    assert len(lines) == 10 + lines.index("end_header") + 1
    x, y, z = map(float, lines[-1].split()[:3])
    np.testing.assert_allclose([x, y, z], pts[9], atol=1e-3)


def test_depth_image_nearest_wins():
    pts = np.array([[0.0, 0.0, 5.0], [0.0, 0.0, 2.0]], np.float32)
    d = depth_image(pts, E, K, (64, 128))
    # both project to the principal point (64, 32); nearest (z=2) wins
    assert d[32, 64] == 2.0
    assert (d > 0).sum() == 1


def test_realloc_vis_dataset_and_real_demo(tmp_path):
    """REAL_DATA frame reading + the real-data vis demo
    (ref evaluation_vis.py:283-293 realloc branch, dataset_params.py:156)."""
    import sys

    from PIL import Image

    from i2pnet_tpu.data.params import REAL_DATA
    from i2pnet_tpu.data.realloc import REALLOC_K, RealLocVisDataset

    assert REAL_DATA["test"]["root_path"].endswith("real_localize")

    root = tmp_path / "real_localize"
    rng = np.random.default_rng(0)
    for seq, ts in [("00", "1690000000.1"), ("00", "1690000001.2")]:
        vdir = root / "sequences" / seq / "velodyne"
        idir = root / "sequences" / seq / "images"
        vdir.mkdir(parents=True, exist_ok=True)
        idir.mkdir(parents=True, exist_ok=True)
        pts = rng.uniform(-10, 10, size=(200, 4)).astype(np.float32)
        pts[:, 2] += 15.0
        pts.tofile(vdir / f"{ts}.bin")
        Image.fromarray(
            rng.integers(0, 255, size=(64, 96, 3), dtype=np.uint8)
        ).save(idir / f"{ts}.jpg")

    ds = RealLocVisDataset(str(root))
    assert len(ds) == 2
    s = ds[0]
    assert s["pcl"].shape == (200, 3) and s["img"].shape == (64, 96, 3)
    np.testing.assert_array_equal(s["K"], REALLOC_K)

    # prediction.txt in the Evaluator's section format
    E = np.hstack([np.eye(3), np.array([[0.1], [0.0], [0.5]])])
    row = " ".join(f"{v:.6f}" for v in E.ravel())
    pred = tmp_path / "prediction.txt"
    pred.write_text(
        "\n".join(
            ["# section 0"]
            + [f"{k} {row}" for _ in range(2) for k in ("init", "pred", "gt")]
        )
        + "\n"
    )

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from render_real_demo import render_real_demo

    out = tmp_path / "frames"
    n = render_real_demo(str(root), str(pred), str(out), video="demo.gif")
    assert n == 2
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 2
    assert (out / "demo.gif").exists()
