"""UniWriter fan-out tests (ref /root/reference/monitor/base.py:8-56).

The reference's UniWriter sends scalars AND images to BOTH TensorBoard and
wandb; add_images concats the NHWC batch to one H x (W*B) wandb image
(ref monitor/base.py:41-56). Verified here against fake sinks so the test
needs neither package.
"""

import json
import os

import numpy as np
import pytest

from i2pnet_tpu.utils.monitor import UniWriter


class _FakeTB:
    def __init__(self):
        self.scalars = []
        self.images = []
        self.image_batches = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, value, step))

    def add_image(self, tag, img, step, dataformats):
        self.images.append((tag, np.asarray(img).shape, step, dataformats))

    def add_images(self, tag, imgs, step, dataformats):
        self.image_batches.append(
            (tag, np.asarray(imgs).shape, step, dataformats))

    def close(self):
        pass


class _FakeWandbRun:
    def __init__(self):
        self.logged = []

    def log(self, d, step=None):
        self.logged.append((d, step))

    def finish(self):
        pass


class _FakeWandbImage:
    def __init__(self, arr, **kw):
        self.arr = np.asarray(arr)


@pytest.fixture
def writer(tmp_path, monkeypatch):
    import types
    import sys

    fake_wandb = types.SimpleNamespace(Image=_FakeWandbImage)
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)
    w = UniWriter(str(tmp_path), enable_tb=False)
    w._tb = _FakeTB()
    w._wandb = _FakeWandbRun()
    yield w
    w._wandb = None  # skip finish() on the fake
    w.close()


def test_scalar_fans_to_all_sinks(writer, tmp_path):
    writer.add_scalar("train/loss", 1.5, step=3)
    assert writer._tb.scalars == [("train/loss", 1.5, 3)]
    assert writer._wandb.logged == [({"train/loss": 1.5}, 3)]
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        rec = json.loads(f.readline())
    assert rec["tag"] == "train/loss" and rec["value"] == 1.5


def test_add_image_fans_to_tb_and_wandb(writer):
    img = np.zeros((4, 6, 3), np.uint8)
    writer.add_image("val/proj", img, step=7)
    assert writer._tb.images == [("val/proj", (4, 6, 3), 7, "HWC")]
    (logged, step), = writer._wandb.logged
    assert step == 7 and logged["val/proj"].arr.shape == (4, 6, 3)


def test_add_images_concats_batch_for_wandb(writer):
    # distinct per-sample fill so the concat order is checkable
    imgs = np.stack([np.full((4, 6, 3), i, np.uint8) for i in range(3)])
    writer.add_images("val/batch", imgs, step=2)
    assert writer._tb.image_batches == [("val/batch", (3, 4, 6, 3), 2, "NHWC")]
    (logged, step), = writer._wandb.logged
    concat = logged["val/batch"].arr
    assert concat.shape == (4, 18, 3)  # H x (W*B) x C, ref base.py:52-55
    # ref's permute(1,2,0,3).reshape interleaves the batch per column
    # (b varies fastest), not side-by-side — reproduced deliberately
    assert list(concat[0, 0:3, 0]) == [0, 1, 2]
    assert list(concat[0, 3:6, 0]) == [0, 1, 2]
