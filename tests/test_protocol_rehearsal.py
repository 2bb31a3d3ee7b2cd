"""Geometric-consistency tests for the protocol-rehearsal generator.

The rehearsal (tools/protocol_rehearsal.py, VERDICT r3 item 7) only proves
anything if its on-disk data is consistent: each image must be the splat of
that frame's cloud through the on-disk calib. These tests verify the
invariant end to end THROUGH the real dataset loaders, so a loader-side
geometry change that silently broke the rehearsal would fail here first.
"""

import numpy as np
import pytest

from tools.protocol_rehearsal import (
    CROP_TOP,
    IMG_H_RAW,
    IMG_W_RAW,
    _calib_mats,
    gen_cmr_root,
    gen_large_root,
    make_frame,
)


def _lit_fraction(rgb, uv, margin=2):
    """Fraction of projected points that land on/next to a lit pixel."""
    h, w = rgb.shape[:2]
    lum = np.asarray(rgb[..., 0], np.float32)
    ok, total = 0, 0
    for u, v in uv:
        ui, vi = int(round(u)), int(round(v))
        if not (margin <= ui < w - margin and margin <= vi < h - margin):
            continue
        total += 1
        if lum[vi - margin : vi + margin + 1, ui - margin : ui + margin + 1].max() > 0:
            ok += 1
    assert total > 100, "too few in-bounds projections to judge"
    return ok / total


def test_make_frame_projects_onto_lit_pixels(tmp_path):
    rng = np.random.default_rng(0)
    K, Pc4 = _calib_mats(str(tmp_path))
    pc, img = make_frame(rng, K, Pc4, 2000)
    p_cam = Pc4[:3, :3] @ pc + Pc4[:3, 3:4]
    assert np.all(p_cam[2] > 1.0), "points must be in front of the camera"
    uvw = K @ p_cam
    uv = (uvw[:2] / uvw[2]).T
    assert np.all(uv[:, 1] > CROP_TOP), "points must survive the top crop"
    assert _lit_fraction(img, uv, margin=0) > 0.95
    assert img.shape == (IMG_H_RAW, IMG_W_RAW, 3)


@pytest.mark.parametrize("family", ["cmr", "large"])
def test_generated_roots_consistent_through_loaders(tmp_path, family):
    """Load a generated frame through the REAL protocol loader and check
    the gt-warped cloud projects onto lit pixels of the loader's image."""
    rng = np.random.default_rng(1)
    root = str(tmp_path)
    if family == "cmr":
        from i2pnet_tpu.data.kitti_odometry_cmr import KittiOdometryCMRDataset

        gen_cmr_root(root, rng, frames_train=0, frames_test=2, n_points=4000)
        ds = KittiOdometryCMRDataset(root, mode="test", sample_point=2048)
    else:
        from i2pnet_tpu.data.kitti_large_range import KittiLargeRangeDataset

        gen_large_root(root, rng, frames_train=0, frames_eval=2,
                       n_points=4000)
        ds = KittiLargeRangeDataset(
            root, mode="test", sample_point=4096, seqs=(7,))
    s = ds[0]

    # undo the decalibration: warp(lidar, q_gt, t_gt) is the camera-frame
    # cloud that the intrinsic projects into the (cropped/resized) image
    q, t = s["decalib_real_gt"], s["decalib_dual_gt"]

    def quat_to_rot(qw):
        w, x, y, z = qw
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    lidar = s["lidar"][:, :3]
    nz = np.abs(lidar).sum(axis=1) > 0  # drop zero padding
    cam = lidar[nz] @ quat_to_rot(q).T + t
    uvw = cam @ np.asarray(s["init_intrinsic"]).T
    infront = uvw[:, 2] > 1.0
    uv = uvw[infront, :2] / uvw[infront, 2:3]
    frac = _lit_fraction(np.asarray(s["rgb"]), uv)
    # resize/crop smears the splat; demand a strong majority
    assert frac > 0.8, f"{family}: only {frac:.2f} of points hit lit pixels"
