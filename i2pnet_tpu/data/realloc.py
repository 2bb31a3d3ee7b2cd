"""Real-rig localization frames ("real_localize" / REAL_DATA).

The reference registers this dataset in src/dataset_params.py:156-180
(REAL_DATA) and reads its frames in the vis demo's "realloc" branch
(ref evaluation_vis.py:283-293): sequences/<seq>/velodyne/<ts>.bin KITTI-
format scans + sequences/<seq>/images/<ts>.jpg camera frames with one
fixed rig intrinsic. The snapshot's training loader (src/real_dataset.py,
imported at evaluation_vis.py:110) is absent from the reference — that
branch is vestigial there; this module implements the frame reading the
vis demo needs.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

# the real rig's camera intrinsic (ref evaluation_vis.py:292-294)
REALLOC_K = np.array(
    [
        [1265.1835, 0.0, 650.6398],
        [0.0, 1265.3955, 536.6536],
        [0.0, 0.0, 1.0],
    ],
    np.float32,
)


def _read_image(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


class RealLocVisDataset:
    """Sequential real-rig frames for the vis demo.

    root layout (ref evaluation_vis.py:286-291):
      <root>/sequences/<seq>/velodyne/<ts>.bin  — KITTI velodyne format
      <root>/sequences/<seq>/images/<ts>.jpg

    frames: explicit [(seq, ts), ...]; default scans every sequence's
    velodyne dir in sorted order.
    """

    def __init__(
        self,
        root: str,
        frames: Optional[Sequence[Tuple[str, str]]] = None,
    ):
        self.root = root
        if frames is None:
            frames = []
            seq_root = os.path.join(root, "sequences")
            for seq in sorted(os.listdir(seq_root)):
                vdir = os.path.join(seq_root, seq, "velodyne")
                if not os.path.isdir(vdir):
                    continue
                for fn in sorted(os.listdir(vdir)):
                    if fn.endswith(".bin"):
                        frames.append((seq, fn[:-4]))
        self.frames: List[Tuple[str, str]] = list(frames)

    def __len__(self) -> int:
        return len(self.frames)

    def __getitem__(self, i: int) -> dict:
        seq, ts = self.frames[i]
        from i2pnet_tpu.data.native_io import read_velodyne_bin

        pc_path = os.path.join(
            self.root, "sequences", seq, "velodyne", ts + ".bin"
        )
        xyz, intensity = read_velodyne_bin(pc_path)
        img = None
        for ext in (".jpg", ".png"):
            ip = os.path.join(self.root, "sequences", seq, "images", ts + ext)
            if os.path.exists(ip):
                img = _read_image(ip)
                break
        if img is None:
            raise FileNotFoundError(
                os.path.join(self.root, "sequences", seq, "images", ts + ".jpg")
            )
        return {
            "seq": seq,
            "ts": ts,
            "img": img,
            "pcl": xyz,
            "intensity": intensity,
            "K": REALLOC_K.copy(),
        }
