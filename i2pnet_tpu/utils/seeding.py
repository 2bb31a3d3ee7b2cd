"""Determinism helpers (ref /root/reference/src/deterministic.py:6-48).

JAX is deterministic by construction (explicit PRNG keys, no cudnn
nondeterminism to disable); what remains is seeding the host-side numpy/
random generators used by the data pipeline.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 0) -> None:
    random.seed(seed)
    np.random.seed(seed)


def worker_seed(base_seed: int, worker_id: int) -> int:
    """Per-worker derived seed (ref deterministic.py:6-13 seed_worker)."""
    return (base_seed * 1000003 + worker_id) % (2**31 - 1)
