"""Benchmark: image-LiDAR registration pairs/sec/chip on TPU.

Headline metric: flagship forward (free-point I2PNet, shipped config, KITTI
small-range shapes: batch 8, N=8192 points, 384x1280 image — matching the
reference eval protocol batch size, ref evaluation_proj.py:239-264).

The same JSON line additionally carries the other three hot paths so
regressions in any of them show in BENCH_r*.json:
  * proj_fwd_pairs_per_sec   — projection model forward (150k pts, 64x1800
    spherical grid, ref evaluation_proj.py protocol shapes)
  * train_pairs_per_sec      — free-point fused train step (fwd+bwd+Adam)
  * proj_train_pairs_per_sec — projection train step

Regression-gate methodology (round 4, after BENCH_r03's proj numbers
silently lost 29% to host state):
  * each model family runs in its OWN subprocess (a stuck remote compile
    kills only that family via timeout, not the whole bench — the round-3
    tunnel lesson);
  * each path takes the MEDIAN of >= 3 independent 20-iteration windows
    (10-iter windows under host load mismeasure by ~10%, BASELINE.md
    round-3 methodology note) and reports the window spread
    (max-min)/median in *_spread_pct fields, so an unquiet host is visible
    in the artifact instead of silently recorded as a regression.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
the denominator below is the driver north star's reference-GPU estimate used
as the 5x-target base. It is replaced by a measured number once one exists.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

# Estimated reference single-GPU pairs/sec (batch 8 eval protocol). No
# published value exists in-repo (BASELINE.md); documented assumption.
REFERENCE_PAIRS_PER_SEC = 40.0

BATCH = 8
IMG_H, IMG_W = 384, 1280
WINDOWS = 3
ITERS = 20
SUBPROCESS_TIMEOUT_S = 1800


def sync(x):
    # NOTE: jax.block_until_ready does NOT actually block on the axon
    # tunnel; force completion by pulling a scalar to the host (FIFO queue
    # means one pull fences all queued work).
    import jax
    import numpy as np

    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def _windows(run_iters, warmup, windows=WINDOWS):
    """Median pairs/s over `windows` independent timing windows + spread."""
    warmup()
    vals = []
    for _ in range(windows):
        dt = run_iters(ITERS)
        vals.append(BATCH * ITERS / dt)
    vals.sort()
    med = vals[len(vals) // 2]
    spread = (vals[-1] - vals[0]) / med * 100.0
    return med, spread


def bench_free_point():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet

    # production inference config: bf16 conv/dense compute (outputs match
    # f32 to ~3e-3; f32: 164 pairs/s, bf16: 241 pairs/s on v5e)
    cfg = dataclasses.replace(I2PNetConfig(), compute_dtype="bfloat16")
    model = I2PNet(cfg)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(BATCH, IMG_H, IMG_W, 3)).astype(np.float32))
    lidar = jnp.asarray(
        rng.uniform(-10, 10, size=(BATCH, cfg.lidar_in_points, 3)).astype(np.float32)
    )
    lidar = lidar.at[..., 2].add(20.0)
    intrinsic = jnp.tile(
        jnp.asarray(
            [[[718.0, 0, IMG_W / 2], [0, 718.0, IMG_H / 2], [0, 0, 1]]],
            dtype=jnp.float32,
        ),
        (BATCH, 1, 1),
    )

    variables = model.init(jax.random.key(0), rgb, lidar, intrinsic, train=False)

    @jax.jit
    def forward(variables, rgb, lidar, intrinsic):
        out = model.apply(variables, rgb, lidar, intrinsic, train=False)
        return out["out3"], out["out4"]

    def fwd_window(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = forward(variables, rgb, lidar, intrinsic)
        sync(out)
        return time.perf_counter() - t0

    fwd, fwd_spread = _windows(
        fwd_window, lambda: sync(forward(variables, rgb, lidar, intrinsic))
    )

    # fused train step on the same shapes (fwd + loss + bwd + Adam)
    from i2pnet_tpu.train import create_train_state, make_train_step

    batch = {
        "rgb": rgb, "lidar": lidar, "intrinsic": intrinsic,
        "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (BATCH, 1)),
        "decalib_t_gt": jnp.zeros((BATCH, 3)),
    }
    state = create_train_state(model, variables, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))

    def train_warmup():
        nonlocal state
        state, m = step(state, batch, jax.random.key(0))
        sync(m["loss"])

    def train_window(iters):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for i in range(iters):
            state, m = step(state, batch, jax.random.key(i))
        sync(m["loss"])
        return time.perf_counter() - t0

    train, train_spread = _windows(train_window, train_warmup)
    return {
        "fwd": fwd, "fwd_spread": fwd_spread,
        "train": train, "train_spread": train_spread,
    }


def bench_proj():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from i2pnet_tpu.config import I2PNetProjConfig
    from i2pnet_tpu.models import I2PNetProj
    from i2pnet_tpu.ops import quaternion as Q

    # production inference config: bf16 conv/MLP compute, distance/Lie math
    # pinned f32 — the free-point recipe applied to the proj family in
    # round 4 (fwd 158.3 -> 214.0, train 79.4 -> 93.2 pairs/s; BASELINE.md
    # round-4b/4c, convergence re-checked with --proj --dtype bfloat16)
    cfg = dataclasses.replace(I2PNetProjConfig(), compute_dtype="bfloat16")
    model = I2PNetProj(cfg)
    rng = np.random.default_rng(0)
    N = 150000
    raw_np = rng.normal(size=(BATCH, N, 3)).astype(np.float32) * 15
    raw_np[:, 120000:] = 0.0  # zero-pad tail, as the loader emits
    raw = jnp.asarray(raw_np)
    q = jnp.asarray([[0.999, 0.0, 0.04, 0.0]] * BATCH, jnp.float32)
    lidar = Q.warp_points(raw, q, jnp.asarray([[1.0, 0, 2.0]] * BATCH)) * (
        jnp.sum(raw**2, -1, keepdims=True) > 0
    )
    rgb = jnp.asarray(rng.normal(size=(BATCH, 160, 512, 3)).astype(np.float32))
    intr = jnp.tile(
        jnp.asarray([[[350.0, 0, 256], [0, 350.0, 80], [0, 0, 1]]], jnp.float32),
        (BATCH, 1, 1),
    )
    variables = model.init(jax.random.key(0), rgb, lidar, raw, intr, train=False)
    fwd = jax.jit(
        lambda v, r, l, w, i: model.apply(v, r, l, w, i, train=False)["out3"]
    )

    def fwd_window(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fwd(variables, rgb, lidar, raw, intr)
        sync(out)
        return time.perf_counter() - t0

    proj_fwd, proj_fwd_spread = _windows(
        fwd_window, lambda: sync(fwd(variables, rgb, lidar, raw, intr))
    )

    # proj train step (fwd+bwd+Adam) — the path large-range training runs
    # (ref train20v2learn_wandb_proj.py); in the JSON so regressions show
    from i2pnet_tpu.train import create_train_state, make_train_step_proj

    batch = {
        "rgb": rgb, "lidar": lidar, "raw_xyz": raw, "intrinsic": intr,
        "decalib_q_gt": jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (BATCH, 1)),
        "decalib_t_gt": jnp.zeros((BATCH, 3)),
    }
    state = create_train_state(model, variables, steps_per_epoch=100)
    step = jax.jit(make_train_step_proj(model, cfg), donate_argnums=(0,))

    def train_warmup():
        nonlocal state
        state, m = step(state, batch, jax.random.key(0))
        sync(m["loss"])

    def train_window(iters):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for i in range(iters):
            state, m = step(state, batch, jax.random.key(i))
        sync(m["loss"])
        return time.perf_counter() - t0

    # 5 windows here (vs 3 elsewhere): BENCH_r04's proj_train_spread was
    # 2.5% — the noisiest number on the scoreboard (round-4 verdict weak
    # #4) — so its median gets two extra windows of protection
    proj_train, proj_train_spread = _windows(train_window, train_warmup,
                                             windows=5)
    return {
        "fwd": proj_fwd, "fwd_spread": proj_fwd_spread,
        "train": proj_train, "train_spread": proj_train_spread,
    }


def _run_family(name):
    fn = {"free": bench_free_point, "proj": bench_proj}[name]
    print(json.dumps({"family": name, **fn()}))


def main():
    # orchestrate: each family in its own subprocess so a wedged compile
    # (round-3 tunnel failure mode) can only take out its own numbers
    results = {}
    for family in ("free", "proj"):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--family", family],
                capture_output=True, text=True, timeout=SUBPROCESS_TIMEOUT_S,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            results[family] = json.loads(line)
        except Exception as e:  # timeout, no JSON, crash
            results[family] = {"error": f"{type(e).__name__}"}

    free, proj = results["free"], results["proj"]
    record = {
        "metric": "image_lidar_pairs_per_sec_per_chip",
        "value": round(free.get("fwd", 0.0), 2),
        "unit": "pairs/s",
        "vs_baseline": round(free.get("fwd", 0.0) / REFERENCE_PAIRS_PER_SEC, 3),
        "train_pairs_per_sec": round(free.get("train", 0.0), 2),
        "proj_fwd_pairs_per_sec": round(proj.get("fwd", 0.0), 2),
        "proj_train_pairs_per_sec": round(proj.get("train", 0.0), 2),
        # window spreads ((max-min)/median, %): >~5% means the host was not
        # quiet and the medians should be re-measured before gating on them
        "fwd_spread_pct": round(free.get("fwd_spread", -1.0), 1),
        "train_spread_pct": round(free.get("train_spread", -1.0), 1),
        "proj_fwd_spread_pct": round(proj.get("fwd_spread", -1.0), 1),
        "proj_train_spread_pct": round(proj.get("train_spread", -1.0), 1),
        "windows": WINDOWS,
        "iters_per_window": ITERS,
    }
    for family, r in results.items():
        if "error" in r:
            record[f"{family}_error"] = r["error"]
    print(json.dumps(record))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--family":
        _run_family(sys.argv[2])
    else:
        main()
