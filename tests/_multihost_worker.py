"""Worker program for the two-process multi-host integration test.

Run as: python _multihost_worker.py <nproc> <pid> <port>

Each process initializes jax.distributed against a localhost coordinator,
loads ONLY its host_batch_slice of a deterministic synthetic global batch,
assembles the global array via make_global_batch, runs ONE DP train step of
the tiny free-point model over the global mesh, and prints the loss. With
nproc=1 the same program is the single-process reference; the test asserts
the losses match bit-for-bit (SURVEY §5.8 multi-host recipe).

Not collected by pytest (no test_ prefix).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_i2pnet_mh")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    nproc, pid, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    if nproc > 1:
        from i2pnet_tpu.parallel import maybe_initialize_distributed

        assert maybe_initialize_distributed(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc,
            process_id=pid,
        )

    import numpy as np
    import jax.numpy as jnp

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from i2pnet_tpu.parallel import (
        host_batch_slice,
        make_global_batch,
        make_mesh,
        shard_train_step,
    )
    from i2pnet_tpu.train import create_train_state, make_train_step

    assert jax.process_count() == nproc, (jax.process_count(), nproc)

    B = 4
    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    rng = np.random.default_rng(0)
    full = {
        "rgb": rng.normal(size=(B, 64, 128, 3)).astype(np.float32),
        "lidar": (
            rng.uniform(-10, 10, size=(B, cfg.lidar_in_points, 3)) + [[[0, 0, 20]]]
        ).astype(np.float32),
        "intrinsic": np.tile(
            np.asarray([[[64.0, 0, 64], [0, 64.0, 32], [0, 0, 1]]], np.float32),
            (B, 1, 1),
        ),
        "decalib_q_gt": np.tile(
            np.asarray([[1.0, 0, 0, 0]], np.float32), (B, 1)
        ),
        "decalib_t_gt": np.zeros((B, 3), np.float32),
    }
    # each process loads only its slice — the multi-host loading contract
    sl = host_batch_slice(B)
    host = {k: v[sl] for k, v in full.items()}

    mesh = make_mesh(jax.devices())  # global mesh spanning both processes
    batch = make_global_batch(mesh, host)

    # init from abstract shapes so every process builds identical params
    # without materializing per-host input arrays into the init
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((B, 64, 128, 3)),
        jnp.zeros((B, cfg.lidar_in_points, 3)),
        jnp.zeros((B, 3, 3)),
        train=False,
    )
    state = create_train_state(model, variables, lr=1e-3, steps_per_epoch=10)
    # multi-process convention: replicated INPUTS are passed as host values
    # (identical on every process) and jit globalizes them under the
    # replicated in_sharding — device_put cannot target non-addressable
    # devices, so process-local jax.Arrays are pulled back to numpy first
    state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, state
    )
    key_data = np.asarray(jax.random.key_data(jax.random.key(1)))

    base_step = make_train_step(model, cfg)

    def step_fn(state, batch, key_data):
        return base_step(state, batch, jax.random.wrap_key_data(key_data))

    step = shard_train_step(step_fn, mesh)
    # compile explicitly, then rendezvous on the coordination service
    # (plain RPC) BEFORE the first collective executes: on a 1-core box the
    # two processes compile serially (~minutes each) and Gloo's context
    # init only waits ~30 s for its peer — executing before both are
    # compiled times the rendezvous out
    compiled = step.lower(state, batch, key_data).compile()
    if nproc > 1:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "compiled", timeout_in_ms=1_800_000
        )
    state, metrics = compiled(state, batch, key_data)
    loss = np.asarray(jax.device_get(metrics["loss"]))
    print(f"NPROC={nproc} PID={pid} DEVICES={len(jax.devices())} "
          f"LOSS={float(loss):.10e}", flush=True)


if __name__ == "__main__":
    main()
