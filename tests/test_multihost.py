"""REAL two-process multi-host execution (jax.process_count() == 2).

Launches two subprocesses with jax.distributed.initialize against a
localhost coordinator on CPU (2 local devices each -> a 4-device global
mesh), each loading only its host_batch_slice, and asserts the DP train
step's loss is bit-for-bit identical to a single-process 4-device run of
the same program (SURVEY §5.8; parallel/distributed.py).

Slow-marked: three subprocess JAX start-ups + a tiny-model compile each.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    "not config.getoption('--run-slow', default=False)",
    reason="three subprocess jax runs (~minutes on this box); run with "
    "--run-slow",
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _parse_loss(out: str) -> str:
    for line in out.splitlines():
        if line.startswith("NPROC="):
            return line.split("LOSS=")[1].strip()
    raise AssertionError(f"no LOSS line in output:\n{out}")


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "2", str(pid), str(port)],
            env=_env(2),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=ROOT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    losses = [_parse_loss(o) for o in outs]
    assert losses[0] == losses[1], losses  # replicated scalar agrees

    single = subprocess.run(
        [sys.executable, WORKER, "1", "0", "0"],
        env=_env(4),
        capture_output=True,
        text=True,
        cwd=ROOT,
        timeout=1200,
    )
    assert single.returncode == 0, single.stdout + single.stderr
    ref = _parse_loss(single.stdout)
    # bit-for-bit: same global batch, same 4-device DP layout, same
    # executable — multi-host assembly must not change a single ulp
    assert losses[0] == ref, (losses[0], ref)
