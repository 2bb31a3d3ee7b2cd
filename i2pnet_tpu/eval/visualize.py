"""Visualization helpers (ref /root/reference/src/visualize.py,
src/util/vis_tools.py, evaluation_vis*.py).

Renders LiDAR points projected through an extrinsic + intrinsic over the
RGB image, colored by depth — the core artifact of the reference's
visual-evaluation scripts — plus a side-by-side init/pred/gt panel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def project_points_to_image(
    points: np.ndarray,
    extrinsic: np.ndarray,
    intrinsic: np.ndarray,
    img_hw: Tuple[int, int],
):
    """points (N,3) -> (uv (M,2), depth (M,)) of in-frustum projections."""
    cam = points @ extrinsic[:, :3].T + extrinsic[:, 3]
    uvw = cam @ intrinsic.T
    z = uvw[:, 2]
    uv = uvw[:, :2] / (z[:, None] + 1e-10)
    m = (
        (z > 0.1)
        & (uv[:, 0] >= 0) & (uv[:, 0] < img_hw[1])
        & (uv[:, 1] >= 0) & (uv[:, 1] < img_hw[0])
    )
    return uv[m], z[m]


def _depth_colors(z: np.ndarray) -> np.ndarray:
    """Simple jet-like depth colormap -> uint8 (M, 3)."""
    t = np.clip((z - z.min()) / (np.ptp(z) + 1e-10), 0, 1)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def render_projection(
    rgb: np.ndarray,
    points: np.ndarray,
    extrinsic: np.ndarray,
    intrinsic: np.ndarray,
    radius: int = 1,
) -> np.ndarray:
    """Overlay depth-colored projected points on an image (HWC uint8)."""
    img = np.ascontiguousarray(rgb).astype(np.uint8).copy()
    H, W = img.shape[:2]
    uv, z = project_points_to_image(points, extrinsic, intrinsic, (H, W))
    if len(uv) == 0:
        return img
    colors = _depth_colors(z)
    u = uv[:, 0].astype(np.int64)
    v = uv[:, 1].astype(np.int64)
    for du in range(-radius, radius + 1):
        for dv in range(-radius, radius + 1):
            uu = np.clip(u + du, 0, W - 1)
            vv = np.clip(v + dv, 0, H - 1)
            img[vv, uu] = colors
    return img


def render_comparison(
    rgb: np.ndarray,
    points: np.ndarray,
    init_extrinsic: np.ndarray,
    pred_extrinsic: np.ndarray,
    gt_extrinsic: np.ndarray,
    intrinsic: np.ndarray,
) -> np.ndarray:
    """Vertical init/pred/gt panel (the reference's demo layout)."""
    panels = [
        render_projection(rgb, points, E, intrinsic)
        for E in (init_extrinsic, pred_extrinsic, gt_extrinsic)
    ]
    return np.concatenate(panels, axis=0)


def save_image(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)
