"""Input pipeline: batching, shuffling, background prefetch to device.

Replaces the reference's torch DataLoader worker-pool (ref
train20v2learn_wandb.py:156-180) with a thread-backed prefetcher feeding
sharded device arrays: numpy batch assembly overlaps with the device step,
and device_put lands the batch directly in its DP sharding.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import jax
import numpy as np

# keys the jitted steps consume; the rest stay host-side for eval/bookkeeping
DEVICE_KEYS = (
    "rgb",
    "lidar",
    "lidar_feats",
    "raw_point_xyz",
    "init_intrinsic",
    "decalib_real_gt",
    "decalib_dual_gt",
)

# names used by the train-step batch dicts
KEY_RENAMES = {
    "init_intrinsic": "intrinsic",
    "decalib_real_gt": "decalib_q_gt",
    "decalib_dual_gt": "decalib_t_gt",
    "raw_point_xyz": "raw_xyz",
}


def collate(samples: Sequence[dict], device_only: bool = False) -> Dict[str, np.ndarray]:
    """Stack sample dicts into batch arrays (numeric keys only)."""
    out = {}
    keys = DEVICE_KEYS if device_only else samples[0].keys()
    for k in keys:
        if k not in samples[0]:
            continue
        v0 = samples[0][k]
        if isinstance(v0, str):
            out[k] = [s[k] for s in samples]
        elif isinstance(v0, np.ndarray) or np.isscalar(v0):
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
        else:
            out[k] = [s[k] for s in samples]
    return out


def to_model_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename loader keys to the train-step schema."""
    return {KEY_RENAMES.get(k, k): v for k, v in batch.items()}


class BatchLoader:
    """Shuffled epoch iterator with a background prefetch thread.

    dataset: any object with __len__/__getitem__ returning sample dicts.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        device_only: bool = False,
        transform: Optional[Callable[[dict], dict]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.device_only = device_only
        self.transform = transform
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self) -> List[np.ndarray]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._index_batches()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for bidx in batches:
                    samples = [self.dataset[int(i)] for i in bidx]
                    b = collate(samples, device_only=self.device_only)
                    if self.transform is not None:
                        b = self.transform(b)
                    q.put(b)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def prefetch_to_device(iterator, sharding=None, size: int = 2):
    """Move batches onto device(s) ahead of consumption.

    sharding: optional jax Sharding applied to every array (e.g. the DP
    batch sharding from i2pnet_tpu.parallel.batch_spec).
    """
    buf: List = []

    def put(b):
        if sharding is None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x, b
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding) if isinstance(x, np.ndarray) else x,
            b,
        )

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
