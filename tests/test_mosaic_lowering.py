"""TPU (Mosaic) lowering checks for the Pallas kernels, chip-free.

jax.export with platforms=['tpu'] runs the Pallas -> Mosaic MLIR
lowering on the host (libtpu is installed; no device needed), catching
the unsupported-primitive / layout class of kernel bugs that interpret
mode hides — e.g. value-level dynamic_slice, which interpret accepts
and Mosaic rejects.  The deeper Mosaic -> LLO compile (VMEM limits)
still needs the real chip.  Slow-gated: each lowering takes tens of
seconds on this 1-core box.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    "not config.getoption('--run-slow', default=False)",
    reason="needs --run-slow",
)


def _lower(f, *args):
    jax.export.export(jax.jit(f), platforms=["tpu"])(*args)


def test_selection_kernel_lowers_at_lv1_shape():
    from i2pnet_tpu.ops.select_pallas import selection_multiplicity_pallas

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(2, 64, 1800, 3)).astype(np.float32))
    _lower(
        lambda x: selection_multiplicity_pallas(
            x, out_h=16, out_w=225, qstride=(4, 8), kernel_size=(9, 15),
            K=32, distance=0.75, interpret=False),
        xyz,
    )


@pytest.mark.parametrize("lv", ["lv1_center_bf16", "lv2_default"])
def test_fused_pointnet_lowers(lv):
    from i2pnet_tpu.nn.proj_backbone import ProjectPointNet
    from i2pnet_tpu.ops.pointnet_pallas import dense_pointnet_fused

    rng = np.random.default_rng(1)
    if lv == "lv1_center_bf16":
        B, H, W, Cf = 2, 64, 1800, 3
        kw = dict(out_h=16, out_w=225, stride_h=4, stride_w=8,
                  kernel_size=(9, 15), nsample=32, distance=0.75,
                  mlp=(16, 16, 32))
        center, dtype = True, jnp.bfloat16
    else:
        B, H, W, Cf = 2, 16, 225, 32
        kw = dict(out_h=8, out_w=113, stride_h=2, stride_w=2,
                  kernel_size=(9, 15), nsample=16, distance=3.0,
                  mlp=(32, 32, 64))
        center, dtype = False, jnp.bfloat16
    xyz_raw = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(B, H, W, Cf)).astype(np.float32))
    mod = ProjectPointNet(use_trans=True, use_bn=True, dtype=dtype, **kw)
    variables = mod.init(
        jax.random.PRNGKey(0), xyz_raw[:1], xyz_raw[:1], feat[:1],
        center_mode=center)
    _lower(
        lambda xr, ft, p: dense_pointnet_fused(
            xr, xr, ft, p, center_mode=center, use_trans=True,
            dtype=dtype, interpret=False, **kw)[2],
        xyz_raw, feat, variables["params"],
    )
