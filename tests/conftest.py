"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh
(xla_force_host_platform_device_count=8); real-TPU benchmarking happens in
bench.py, not in the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Silence XLA:CPU AOT loader warnings about the remote-compile service's
# LLVM tuning flags (+prefer-no-gather/scatter); they are not real machine
# features and execution is unaffected.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU tunnel and the env var alone does
# NOT deselect it — this config update is what actually forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: this box has one CPU core and ~0.4 s per op
# compile; caching across test runs keeps the suite usable.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_i2pnet")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow full-config compile tests",
    )
