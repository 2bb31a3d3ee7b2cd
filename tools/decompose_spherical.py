"""Sub-decompose spherical_project's 18 ms (B=8, 150k pts, 64x1800 grid):
binning+segment-reduce vs the packed winner gather, plus A/B of candidate
reformulations — all as full jitted graphs (no standalone micro-ops).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_i2pnet_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from i2pnet_tpu.ops.projection import spherical_project

B, N, H, W = 8, 150000, 64, 1800
FUP, FDOWN = 2.0, -24.8


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(json.dumps({"stage": name, "ms": round(ms, 2)}), flush=True)
    return ms


def binning(xyz):
    az_res = (2.0 * jnp.pi) / W
    v_res = (FUP - FDOWN) * jnp.pi / 180.0 / (H - 1)
    v_offset = -(FDOWN * jnp.pi / 180.0) / v_res
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    r = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1))
    valid = r > 0.0
    col = jnp.floor((jnp.pi - jnp.arctan2(y, x)) / az_res).astype(jnp.int32)
    beta = jnp.arcsin(jnp.where(valid, z / jnp.where(valid, r, 1.0), 0.0))
    row = H - jnp.floor(beta / v_res + v_offset).astype(jnp.int32)
    row = jnp.clip(row, 0, H - 1)
    col = jnp.clip(col, 0, W - 1)
    cell = row * W + col
    batch_offset = jnp.arange(B, dtype=jnp.int32)[:, None] * (H * W)
    seg = jnp.where(valid, cell + batch_offset, B * H * W).reshape(-1)
    return seg, valid


def main():
    rng = np.random.default_rng(0)
    raw_np = rng.normal(size=(B, N, 3)).astype(np.float32) * 15
    raw_np[:, 120000:] = 0.0
    xyz = jnp.asarray(raw_np)
    feats = [jnp.zeros((B, N, 3), jnp.float32), xyz]

    def full(xyz):
        out, fs = spherical_project(xyz, [jnp.zeros((B, N, 3)), xyz], H, W,
                                    FUP, FDOWN, use_rank=False,
                                    ref_pad_quirk=True)
        return out

    timeit("full_spherical_project", jax.jit(full), xyz)

    def bin_only(xyz):
        seg, valid = binning(xyz)
        return seg.astype(jnp.int32).sum()  # consume

    timeit("binning_only", jax.jit(bin_only), xyz)

    def bin_plus_segmax(xyz):
        seg, valid = binning(xyz)
        point_idx = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, :], (B, N)).reshape(-1)
        cand_idx = jnp.where(valid.reshape(-1), point_idx, -1)
        winner_last = jax.ops.segment_max(
            cand_idx, seg, num_segments=B * H * W + 1)
        return winner_last.sum()

    timeit("binning+segment_max", jax.jit(bin_plus_segmax), xyz)

    # gather with precomputed winner indices (isolates the packed gather)
    def winners(xyz):
        seg, valid = binning(xyz)
        point_idx = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None, :], (B, N)).reshape(-1)
        cand_idx = jnp.where(valid.reshape(-1), point_idx, -1)
        winner_last = jax.ops.segment_max(
            cand_idx, seg, num_segments=B * H * W + 1)[: B * H * W]
        return winner_last.reshape(B, H * W)

    widx = jax.jit(winners)(xyz)
    widx = jnp.asarray(np.asarray(widx))  # materialize

    def gather_only(xyz, widx):
        safe = jnp.minimum(jnp.maximum(widx, 0), N - 1)
        packed = jnp.concatenate([xyz, jnp.zeros((B, N, 3)), xyz], axis=-1)
        picked = jnp.take_along_axis(packed, safe[..., None], axis=1)
        return picked.sum()

    timeit("packed_winner_gather", jax.jit(gather_only), xyz, widx)

    # candidate reformulation: one-hot-free sort-based winner (rank=False):
    # sort (seg, idx) by seg then idx; last of each segment wins. Uses a
    # single 64-bit key sort per batch row.
    def sort_based(xyz):
        seg, valid = binning(xyz)
        segb = seg.reshape(B, N)
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        key = segb.astype(jnp.int64) * jnp.int64(N) + idx
        skey = jnp.sort(key, axis=-1)
        scell = (skey // N).astype(jnp.int32)
        sidx = (skey % N).astype(jnp.int32)
        # last element of each cell run: next cell differs
        nxt = jnp.concatenate(
            [scell[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1)
        is_last = scell != nxt
        # scatter winners into the grid: cell ids are UNIQUE among winners
        cell_local = jnp.where(is_last, scell - jnp.arange(B, dtype=jnp.int32)[:, None] * (H * W), H * W)
        cell_local = jnp.where(cell_local < H * W, cell_local, H * W)
        grid = jnp.full((B, H * W + 1), -1, jnp.int32)
        grid = jax.vmap(lambda g, c, v: g.at[c].set(v))(grid, cell_local, sidx)
        return grid.sum()

    timeit("sort_based_winner", jax.jit(sort_based), xyz)


if __name__ == "__main__":
    main()
