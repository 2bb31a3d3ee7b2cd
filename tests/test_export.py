"""Serving-export tests: jax.export artifact must reproduce direct apply.

The reference has no export path (serving = torch checkpoint + full Python
stack, ref evaluation_cmr.py); this covers the framework's serialized
StableHLO serving artifact instead.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from export_model import (  # noqa: E402
    build_inference,
    example_inputs,
    export_model,
    load_exported,
)


def test_export_roundtrip_matches_apply():
    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    args = example_inputs(cfg, proj=False, batch=2, img_hw=(64, 128))
    variables = model.init(jax.random.key(0), *args, train=False)

    blob = export_model(model, variables, cfg, proj=False, batch=2,
                        img_hw=(64, 128))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    fn = load_exported(blob)
    got = jax.jit(fn)(*args)
    want = build_inference(model, variables, proj=False)(*args)
    np.testing.assert_allclose(
        np.asarray(got["q"]), np.asarray(want["q"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["t"]), np.asarray(want["t"]), atol=1e-6
    )
    assert np.allclose(np.linalg.norm(np.asarray(got["q"]), axis=-1), 1.0,
                       atol=1e-5)


def test_export_rejects_wrong_shape():
    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    args = example_inputs(cfg, proj=False, batch=1, img_hw=(64, 128))
    variables = model.init(jax.random.key(0), *args, train=False)
    blob = export_model(model, variables, cfg, proj=False, batch=1,
                        img_hw=(64, 128))
    fn = load_exported(blob)
    bad = (args[0][:, :32], args[1], args[2])  # wrong H
    with np.testing.assert_raises(Exception):
        jax.jit(fn)(*bad)
