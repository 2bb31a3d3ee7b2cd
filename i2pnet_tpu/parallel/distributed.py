"""Multi-host hooks: jax.distributed init + per-host input sharding.

The reference is single-process/single-GPU (SURVEY.md §2.9); multi-host
here follows the standard JAX recipe (SURVEY.md §5.8): every process runs
the same program, `jax.distributed.initialize` wires the coordination
service over DCN, the mesh spans all global devices, and each host loads
only its slice of the batch — `make_global_batch` assembles the global
sharded jax.Array from per-process shards without any cross-host copy of
input data (collectives ride ICI inside the jitted step).

Single-process runs (this box, tests, the virtual 8-device CPU mesh) go
through the same entry points: initialize is a no-op and the "host shard"
is simply the whole batch.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from i2pnet_tpu.parallel.mesh import batch_spec


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when a multi-process run is configured.

    Triggers when called with explicit arguments or when the standard
    JAX_COORDINATOR_ADDRESS / cloud-TPU env is present; returns whether
    initialize() was invoked. Safe to call unconditionally at startup.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    # cloud-TPU auto-config only counts when the worker list names MORE
    # THAN ONE host: this box's base environment exports
    # TPU_WORKER_HOSTNAMES=localhost for its single-chip tunnel, and
    # jax.distributed.initialize() with no coordinator raises there
    # (caught by tests/test_cli_smoke.py)
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES")
    auto_tpu = hosts is not None and len(hosts.split(",")) > 1
    if coordinator_address is None and not auto_tpu:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # the documented contract is "safe to call unconditionally":
        # a half-configured environment degrades to single-process
        import warnings

        warnings.warn(f"jax.distributed.initialize skipped: {e}")
        return False
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) of this host."""
    return jax.process_index(), jax.process_count()


def host_batch_slice(global_batch_size: int) -> slice:
    """The rows of a global batch this host is responsible for loading.

    Global batch is split evenly across processes (it must divide; the
    trainer asserts this at startup the same way the DP sharding does).
    """
    pidx, pcount = process_info()
    if global_batch_size % pcount != 0:
        raise ValueError(
            f"process count {pcount} must divide global batch "
            f"{global_batch_size}"
        )
    per = global_batch_size // pcount
    return slice(pidx * per, (pidx + 1) * per)


def make_global_batch(mesh, host_batch: dict, axis_name: str = "data") -> dict:
    """Assemble a globally-sharded device batch from per-host numpy shards.

    Single-process: equivalent to a sharded device_put of the whole batch.
    Multi-process: each process contributes only its host_batch rows;
    jax.make_array_from_process_local_data builds the global jax.Array.
    """
    spec = batch_spec(mesh, axis_name)

    def put(x):
        if not isinstance(x, np.ndarray):
            return x
        if jax.process_count() == 1:
            return jax.device_put(x, spec)
        return jax.make_array_from_process_local_data(spec, x)

    return jax.tree_util.tree_map(put, host_batch)
