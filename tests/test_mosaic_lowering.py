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


