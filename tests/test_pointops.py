"""Unit tests for point-cloud primitives against numpy references.

Numpy oracles mirror the semantics documented for the reference CUDA ops
(sampling_gpu.cu, ball_query_gpu.cu, interpolate_gpu.cu) and python wrappers
(pointnet_util.py, point_utils.py).
"""

import numpy as np
import jax.numpy as jnp

from i2pnet_tpu.ops import pointops as P


def _np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


def test_square_distance():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(2, 16, 3)).astype(np.float32)
    dst = rng.normal(size=(2, 24, 3)).astype(np.float32)
    got = np.asarray(P.square_distance(jnp.array(src), jnp.array(dst)))
    np.testing.assert_allclose(got, _np_square_distance(src, dst), atol=1e-4)


def test_knn_point():
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    new_xyz = rng.normal(size=(2, 8, 3)).astype(np.float32)
    idx = np.asarray(P.knn_point(5, jnp.array(xyz), jnp.array(new_xyz)))
    d = _np_square_distance(new_xyz, xyz)
    want = np.argsort(d, axis=-1)[:, :, :5]
    # order within K is irrelevant (consumed by symmetric reductions)
    np.testing.assert_array_equal(np.sort(idx, -1), np.sort(want, -1))


def test_masked_knn_point():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(1, 32, 3)).astype(np.float32)
    new_xyz = xyz[:, :4]
    mask = np.ones((1, 32), np.float32)
    mask[0, :16] = 0.0  # first 16 excluded
    idx = np.asarray(
        P.masked_knn_point(3, jnp.array(xyz), jnp.array(new_xyz), jnp.array(mask))
    )
    assert (idx >= 16).all()


def test_index_points_2d_and_3d():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx2 = rng.integers(0, 10, size=(2, 5)).astype(np.int32)
    got2 = np.asarray(P.index_points(jnp.array(pts), jnp.array(idx2)))
    for b in range(2):
        np.testing.assert_array_equal(got2[b], pts[b, idx2[b]])
    idx3 = rng.integers(0, 10, size=(2, 5, 3)).astype(np.int32)
    got3 = np.asarray(P.index_points(jnp.array(pts), jnp.array(idx3)))
    for b in range(2):
        np.testing.assert_array_equal(got3[b], pts[b, idx3[b]])


def _np_fps(xyz, npoint):
    """Sequential FPS starting at index 0 (ref sampling_gpu.cu:112-117)."""
    B, N, _ = xyz.shape
    idxs = np.zeros((B, npoint), np.int32)
    dist = np.full((B, N), np.inf)
    farthest = np.zeros((B,), np.int32)
    for i in range(npoint):
        idxs[:, i] = farthest
        centroid = xyz[np.arange(B), farthest][:, None, :]
        d = ((xyz - centroid) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        farthest = dist.argmax(-1).astype(np.int32)
    return idxs


def test_farthest_point_sample_matches_sequential():
    rng = np.random.default_rng(4)
    xyz = rng.normal(size=(2, 128, 3)).astype(np.float32)
    got = np.asarray(P.farthest_point_sample(jnp.array(xyz), 32))
    want = _np_fps(xyz, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_starts_at_zero_and_unique():
    rng = np.random.default_rng(5)
    xyz = rng.normal(size=(1, 64, 3)).astype(np.float32)
    idx = np.asarray(P.farthest_point_sample(jnp.array(xyz), 16))
    assert idx[0, 0] == 0
    assert len(set(idx[0].tolist())) == 16


def test_ball_query():
    """First-nsample-in-radius with first-hit padding (ref ball_query_gpu.cu)."""
    xyz = np.zeros((1, 6, 3), np.float32)
    xyz[0, :, 0] = [0.0, 0.1, 0.2, 5.0, 0.15, 6.0]
    new_xyz = np.zeros((1, 1, 3), np.float32)
    idx = np.asarray(P.ball_query(0.5, 3, jnp.array(xyz), jnp.array(new_xyz)))
    # in-radius candidates in index order: 0, 1, 2, 4 -> first 3
    np.testing.assert_array_equal(idx[0, 0], [0, 1, 2])
    idx = np.asarray(P.ball_query(0.5, 6, jnp.array(xyz), jnp.array(new_xyz)))
    # 4 hits padded with first hit (0) to length 6
    np.testing.assert_array_equal(idx[0, 0], [0, 1, 2, 4, 0, 0])


def test_three_nn_and_interpolate():
    rng = np.random.default_rng(6)
    known = rng.normal(size=(1, 16, 3)).astype(np.float32)
    unknown = rng.normal(size=(1, 8, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 16, 5)).astype(np.float32)
    dists, idx = P.three_nn(jnp.array(unknown), jnp.array(known))
    d_np = np.sqrt(_np_square_distance(unknown, known))
    want_idx = np.argsort(d_np, -1)[:, :, :3]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), np.sort(want_idx, -1))
    np.testing.assert_allclose(
        np.sort(np.asarray(dists), -1),
        np.sort(np.take_along_axis(d_np, want_idx, -1), -1),
        atol=1e-4,
    )
    w = P.interpolation_weights(dists)
    out = np.asarray(P.three_interpolate(jnp.array(feats), idx, w))
    assert out.shape == (1, 8, 5)
    # weights sum to 1 -> interpolation of constant features is exact
    const = np.ones((1, 16, 2), np.float32) * 3.0
    out_c = np.asarray(P.three_interpolate(jnp.array(const), idx, w))
    np.testing.assert_allclose(out_c, 3.0, atol=1e-5)


def test_grouping_with_raw_xyz():
    rng = np.random.default_rng(7)
    src = rng.normal(size=(1, 32, 3)).astype(np.float32)
    q = rng.normal(size=(1, 4, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 32, 6)).astype(np.float32)
    raw_src = src + 100.0
    raw_q = q + 100.0
    gx, diff, gf, idx, graw = P.grouping(
        jnp.array(feats), 4, jnp.array(src), jnp.array(q),
        raw_src_xyz=jnp.array(raw_src), raw_q_xyz=jnp.array(raw_q),
    )
    # diff computed in raw frame == diff in shifted frame
    gx2, diff2, _, idx2, _ = P.grouping(jnp.array(feats), 4, jnp.array(src), jnp.array(q))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    np.testing.assert_allclose(np.asarray(diff), np.asarray(diff2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(graw), np.asarray(gx) + 100.0, atol=1e-4)


def test_sample_and_group_dim10feat():
    rng = np.random.default_rng(8)
    xyz = rng.normal(size=(2, 64, 3)).astype(np.float32)
    new_xyz, new_points, fps_idx, new_raw = P.sample_and_group(
        16, 8, jnp.array(xyz), None, feat_mode="dim10feat"
    )
    assert new_points.shape == (2, 16, 8, 10)
    np_ = np.asarray(new_points)
    # channel layout: [diff(3), center(3), grouped(3), dist(1)]
    np.testing.assert_allclose(
        np_[..., :3], np_[..., 6:9] - np_[..., 3:6], atol=1e-5
    )
    np.testing.assert_allclose(
        np_[..., 9], np.linalg.norm(np_[..., :3], axis=-1), atol=1e-5
    )
    assert new_raw is None


def test_sample_and_group_default_mode():
    rng = np.random.default_rng(9)
    xyz = rng.normal(size=(1, 32, 3)).astype(np.float32)
    feats = rng.normal(size=(1, 32, 4)).astype(np.float32)
    new_xyz, new_points, fps_idx, _ = P.sample_and_group(
        8, 4, jnp.array(xyz), jnp.array(feats)
    )
    assert new_points.shape == (1, 8, 4, 7)  # 3 + D


def test_fps_pallas_interpret_matches_xla():
    """Pallas FPS kernel == XLA loop (interpret mode; real-TPU parity is
    exercised by bench runs)."""
    from i2pnet_tpu.ops.fps_pallas import fps_pallas

    rng = np.random.default_rng(11)
    xyz = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    ref = np.asarray(P.farthest_point_sample(xyz, 16, use_pallas=False))
    got = np.asarray(fps_pallas(xyz, 16, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fps_multidevice_guard(monkeypatch):
    """farthest_point_sample's Pallas dispatch carries the multi-device
    guard matrix (nn/layers.py _fused_mode semantics): on a multi-device
    TPU process with no ambient pure-DP mesh it falls back to the XLA
    loop (a raw pallas_call has no GSPMD partitioning rule); under an
    ambient pure-DP mesh the kernel runs per-shard via shard_map."""
    import jax
    from jax.sharding import Mesh

    import i2pnet_tpu.ops.fps_pallas as fp

    rng = np.random.default_rng(3)
    xyz = jnp.asarray(rng.normal(size=(8, 32, 3)).astype(np.float32))
    ref = np.asarray(P.farthest_point_sample(xyz, 8, use_pallas=False))

    calls = []

    def spy(g, npoint, interpret=False):
        calls.append(g.shape)
        return P.farthest_point_sample(g, npoint, use_pallas=False)

    monkeypatch.setattr(fp, "fps_pallas", spy)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda: 8)

    # multi-device, no ambient mesh: XLA loop, kernel NOT dispatched
    out = P.farthest_point_sample(xyz, 8)
    assert not calls
    np.testing.assert_array_equal(np.asarray(out), ref)

    # ambient pure-DP mesh: kernel engages per-shard (batch 8 / 4 devices)
    with jax.set_mesh(Mesh(np.asarray(jax.devices()[:4]), ("data",))):
        out_dp = P.farthest_point_sample(xyz, 8)
    assert calls and calls[-1][0] == 2
    np.testing.assert_array_equal(np.asarray(out_dp), ref)


def test_knn_exact_flag_paths():
    rng = np.random.default_rng(12)
    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    q = xyz[:, :16]
    exact = np.asarray(P.knn_point(8, xyz, q, exact=True))
    # on CPU the approximate path lowers to an exact reduction
    approx = np.asarray(P.knn_point(8, xyz, q, exact=False))
    np.testing.assert_array_equal(np.sort(exact, -1), np.sort(approx, -1))


def test_mask_grouping():
    rng = np.random.default_rng(13)
    src = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
    q = src[:, :4]
    feats = jnp.asarray(rng.normal(size=(1, 32, 5)).astype(np.float32))
    mask = np.ones((1, 32), np.float32)
    mask[0, :16] = 0.0
    gx, diff, newp, idx = P.mask_grouping(feats, 3, src, q, jnp.asarray(mask))
    assert (np.asarray(idx) >= 16).all()
    assert newp.shape == (1, 4, 3, 5)
    gx2, d2, newp2, _ = P.mask_grouping(
        feats, 3, src, q, jnp.asarray(mask), use_xyz=True
    )
    assert newp2.shape == (1, 4, 3, 8)


def test_min_k_indices_matches_top_k():
    # the iterative TPU path must reproduce lax.top_k's exact contract:
    # ascending scores, ties broken by lowest index
    import jax

    rng = np.random.default_rng(9)
    scores = rng.normal(size=(3, 17, 40)).astype(np.float32)
    # inject ties
    scores[0, 0, 5] = scores[0, 0, 11] = scores[0, 0].min() - 1.0
    for k in (1, 3, 8):
        want = np.asarray(jax.lax.top_k(-jnp.asarray(scores), k)[1])
        got = np.asarray(
            P.min_k_indices(jnp.asarray(scores), k, exact_sort=False)
        )
        np.testing.assert_array_equal(got, want)
    # k > 32 falls back to top_k
    got = np.asarray(P.min_k_indices(jnp.asarray(scores), 33, exact_sort=False))
    want = np.asarray(jax.lax.top_k(-jnp.asarray(scores), 33)[1])
    np.testing.assert_array_equal(got, want)


def test_three_nn_returns_sorted_distances():
    rng = np.random.default_rng(10)
    unknown = rng.normal(size=(2, 12, 3)).astype(np.float32)
    known = rng.normal(size=(2, 30, 3)).astype(np.float32)
    d, idx = P.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d = np.asarray(d)
    sq = _np_square_distance(unknown, known)
    want = np.sort(sq, axis=-1)[:, :, :3]
    np.testing.assert_allclose(d**2, want, atol=1e-3)
    assert (np.diff(d, axis=-1) >= -1e-6).all()


def test_blocked_top_k_min_matches_top_k():
    import jax

    rng = np.random.default_rng(11)
    # multi-block case with injected cross-block and within-block ties
    scores = rng.normal(size=(2, 5, 4096)).astype(np.float32)
    scores[0, 0, 7] = scores[0, 0, 1030] = scores[0, 0, 2060] = -50.0
    scores[1, 2, 100:140] = -99.0  # 40 equal minima in one block
    for k in (1, 8, 32):
        want = np.asarray(jax.lax.top_k(-jnp.asarray(scores), k)[1])
        got = np.asarray(P.blocked_top_k_min(jnp.asarray(scores), k))
        np.testing.assert_array_equal(got, want)
    # non-divisible / small-N fallback agrees too
    s2 = rng.normal(size=(2, 3, 500)).astype(np.float32)
    want = np.asarray(jax.lax.top_k(-jnp.asarray(s2), 4)[1])
    np.testing.assert_array_equal(
        np.asarray(P.blocked_top_k_min(jnp.asarray(s2), 4)), want
    )
