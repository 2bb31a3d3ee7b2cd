"""Dataset parameter registry (ref /root/reference/src/dataset_params.py).

Plain dicts keyed by protocol; paths default to the reference's layout and
are overridable.
"""

from __future__ import annotations

RAW_TRAIN_DRIVES_2011_09_26 = (
    1, 2, 9, 11, 13, 14, 15, 17, 18, 19, 20, 22, 23, 27, 28, 29, 32, 35, 36,
    39, 46, 48, 51, 52, 56, 57, 59, 60, 61, 64, 79, 84, 86, 87, 91, 93, 95,
    96, 101, 104, 106, 113, 117,
)
RAW_VALID_DRIVES_2011_09_26 = (5, 70)
RAW_TEST_DRIVES_2011_09_30 = (28,)


KITTI_ONLINE_CALIB = {
    "train": dict(
        base_path="/dataset/kitti/raw/",
        date="2011_09_26",
        drives=RAW_TRAIN_DRIVES_2011_09_26,
        d_rot=10,
        d_trans=1.0,
        fixed_decalib=False,
        resize_w=1216,
        resize_h=352,
    ),
    "valid1": dict(
        base_path="/dataset/kitti/raw/",
        date="2011_09_26",
        drives=RAW_VALID_DRIVES_2011_09_26,
        d_rot=10,
        d_trans=1.0,
        fixed_decalib=True,
        resize_w=1216,
        resize_h=352,
    ),
    "valid2": dict(
        base_path="/dataset/kitti/raw/",
        date="2011_09_26",
        drives=RAW_VALID_DRIVES_2011_09_26,
        d_rot=2,
        d_trans=0.2,
        fixed_decalib=True,
        resize_w=1216,
        resize_h=352,
    ),
    "valid3": dict(
        base_path="/dataset/kitti/raw/",
        date="2011_09_26",
        drives=RAW_VALID_DRIVES_2011_09_26,
        d_rot=5,
        d_trans=0.5,
        fixed_decalib=True,
        resize_w=1216,
        resize_h=352,
    ),
    "test": dict(
        base_path="/dataset/kitti/raw/",
        date="2011_09_30",
        drives=RAW_TEST_DRIVES_2011_09_30,
        fixed_decalib=True,
        d_rot=10,
        d_trans=1.0,
        resize_w=1216,
        resize_h=352,
    ),
}

KITTI_ODOMETRY = {
    "train": dict(root_path="/dataset", mode="train", max_r=10.0, max_t=2.0),
    "valid": dict(root_path="/dataset", mode="test", max_r=10.0, max_t=2.0),
    "test": dict(root_path="/dataset", mode="val", max_r=10.0, max_t=2.0),
}

NUSCENES = {
    "train": dict(root_path="/dataset/nuScenes", mode="train"),
    "valid": dict(root_path="/dataset/nuScenes", mode="val"),
    "test": dict(root_path="/dataset/nuScenes", mode="test"),
}

# real-rig localization dataset (ref dataset_params.py:156-180 REAL_DATA;
# frames read by data/realloc.py — the reference's own train loader for
# this protocol, src/real_dataset.py, is absent from the snapshot)
REAL_DATA = {
    "train": dict(
        root_path="/dataset/real_localize", mode="train",
        d_rot=10, d_trans=1.0, fixed_decalib=False,
        resize_w=1216, resize_h=352,
    ),
    "valid3": dict(
        root_path="/dataset/real_localize", mode="test",
        d_rot=10, d_trans=1.0, fixed_decalib=False,
        resize_w=1216, resize_h=352,
    ),
    "test": dict(
        root_path="/dataset/real_localize", mode="val",
        d_rot=-1, d_trans=-1, fixed_decalib=False,
        resize_w=1216, resize_h=352,
    ),
}
