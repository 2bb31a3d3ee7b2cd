"""Per-stage online mean/var profiler (ref /root/reference/src/util/tracker.py:21-84).

The reference synchronizes CUDA around each checkpoint; here block_until_ready
fences the device. Usable ad hoc around jitted calls (each stage boundary
forces a device sync, so only enable when profiling).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax


class Timings:
    def __init__(self):
        self.stats: Dict[str, list] = {}  # name -> [count, mean, M2]
        self._last: Optional[float] = None

    def reset(self) -> None:
        """Start a measurement chain (does not clear accumulated stats)."""
        self._sync()
        self._last = time.perf_counter()

    def _sync(self) -> None:
        try:
            jax.effects_barrier()
        except Exception:
            pass

    def time(self, name: str, value=None) -> None:
        """Record the elapsed time since the previous checkpoint.

        Fencing pulls a scalar to host: on this box's remote-TPU transport
        jax.block_until_ready returns before the device finishes (see
        CLAUDE.md platform traps), while a device_get is a real fence."""
        if value is not None:
            leaf = jax.tree_util.tree_leaves(value)[0]
            jax.device_get(leaf.ravel()[0])
        else:
            self._sync()
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return
        dt = now - self._last
        self._last = now
        cnt, mean, m2 = self.stats.setdefault(name, [0, 0.0, 0.0])
        cnt += 1
        delta = dt - mean
        mean += delta / cnt
        m2 += delta * (dt - mean)
        self.stats[name] = [cnt, mean, m2]

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, (cnt, mean, m2) in self.stats.items():
            var = m2 / cnt if cnt > 0 else 0.0
            out[name] = {"count": cnt, "mean_s": mean, "std_s": var**0.5}
        return out

    def __str__(self) -> str:
        return "\n".join(
            f"{k}: {v['mean_s']*1e3:.2f} +- {v['std_s']*1e3:.2f} ms (n={v['count']})"
            for k, v in self.summary().items()
        )
