"""Tests for range-image ops against a numpy oracle of the reference CUDA
kernel (fused_conv_go.cu) and the project_seq semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from i2pnet_tpu.ops import projection as PR


def _oracle_window_select(
    xyz1, xyz2, idx_hw, kernel, K, stride, distance, shift, copy
):
    """Direct transcription of the fused_conv_select_k semantics
    (ref fused_conv_go.cu:49-238, random_hw = arange as in utils.py:84)."""
    B, H, W, _ = xyz1.shape
    h2, w2 = xyz2.shape[1:3]
    kh, kw = kernel
    khw = kh * kw
    N = idx_hw.shape[1]
    h_out = np.zeros((B, N, K), np.int64)
    w_out = np.zeros((B, N, K), np.int64)
    m_out = np.zeros((B, N, K), np.float32)
    for b in range(B):
        for n in range(N):
            hq, wq = idx_hw[b, n]
            c = xyz1[b, hq, wq]
            if max((c**2).sum(), 1e-10) <= 1e-10:
                continue
            dists = np.full(khw, 1e10)
            idh = np.zeros(khw, np.int64)
            idw = np.zeros(khw, np.int64)
            for m in range(khw):
                ksh = hq // stride[0] + m // kw - kh // 2
                ksw = wq // stride[1] + m % kw - kw // 2
                if shift:
                    if ksh < 0 or ksh >= h2:
                        continue
                    ksw = ksw % w2
                else:
                    if ksh < 0 or ksh >= h2 or ksw < 0 or ksw >= w2:
                        continue
                q = xyz2[b, ksh, ksw]
                if (q**2).sum() <= 1e-10:
                    continue
                d = max(((c - q) ** 2).sum(), 1e-10)
                if d > distance * distance:
                    continue
                dists[m], idh[m], idw[m] = d, ksh, ksw
            order = np.argsort(dists, kind="stable")[:K]
            for s, m in enumerate(order):
                if copy and s == 0:
                    h_out[b, n, :] = idh[m]
                    w_out[b, n, :] = idw[m]
                    m_out[b, n, :] = 1.0
                if dists[m] < 1e10:
                    h_out[b, n, s] = idh[m]
                    w_out[b, n, s] = idw[m]
                    m_out[b, n, s] = 1.0
    return h_out, w_out, m_out


def _run_both(xyz1, xyz2, idx_hw, kernel, K, stride, distance, shift, copy):
    got = PR.window_neighbor_select(
        jnp.array(xyz1), jnp.array(xyz2), jnp.array(idx_hw), kernel, K,
        stride, distance, shift, copy,
    )
    want = _oracle_window_select(
        xyz1, xyz2, idx_hw, kernel, K, stride, distance, shift, copy
    )
    return [np.asarray(g) for g in got], want


def _check(got, want, K):
    gh, gw, gm = got
    wh, ww, wm = want
    gm = gm[..., 0]
    np.testing.assert_array_equal(gm, wm)
    # compare as sets per query (tie order may differ), weighted by validity
    g_lin = np.sort(np.where(gm > 0, gh * 10000 + gw, -1), axis=-1)
    w_lin = np.sort(np.where(wm > 0, wh * 10000 + ww, -1), axis=-1)
    np.testing.assert_array_equal(g_lin, w_lin)


def test_golden_case_from_reference():
    """Hand-traced golden case (ref fused_conv_select_k.py:29-139 __main__,
    with random_hw = arange)."""
    H, W, SH, SW = 4, 9, 4, 5
    xyz1 = np.ones((1, H, W, 3), np.float32)
    col = np.concatenate(
        [np.arange(1, SH * (SW - 1) + 1).reshape(SH, SW - 1), np.ones((SH, 1))],
        axis=1,
    ).astype(np.float32)
    xyz2 = np.tile(col.reshape(1, SH, SW, 1), (1, 1, 1, 3))
    idx_hw = np.array([[[0, 2], [0, 0]]], np.int32)
    got, want = _run_both(
        xyz1, xyz2, idx_hw, (1, 3), 5, (1, 2), 200.0, True, False
    )
    _check(got, want, 5)
    # query (0,2): window cols 0,1,2 of row 0 -> dists 0,3,12 -> 3 hits
    np.testing.assert_array_equal(got[2][0, 0, :, 0], [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(got[0][0, 0], [0, 0, 0, 0, 0])  # h row 0
    np.testing.assert_array_equal(np.sort(got[1][0, 0, :3]), [0, 1, 2])  # w


def test_window_select_random_vs_oracle():
    rng = np.random.default_rng(0)
    B, H, W = 2, 6, 10
    xyz1 = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    # punch holes (invalid pixels)
    holes = rng.random((B, H, W)) < 0.3
    xyz1[holes] = 0.0
    idx_hw = np.stack(
        [rng.integers(0, H, (B, 12)), rng.integers(0, W, (B, 12))], axis=-1
    ).astype(np.int32)
    for shift in (True, False):
        for copy in (True, False):
            got, want = _run_both(
                xyz1, xyz1, idx_hw, (3, 5), 4, (1, 1), 1.5, shift, copy
            )
            _check(got, want, 4)


def test_window_select_strided_coarse_grid():
    rng = np.random.default_rng(1)
    B, H, W = 1, 8, 16
    h2, w2 = 4, 8
    xyz1 = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    xyz2 = rng.normal(size=(B, h2, w2, 3)).astype(np.float32)
    xyz2[0, 1, 3] = 0.0
    idx_hw = np.asarray(PR.grid_indices(B, H, W))[:, ::5][:, :20]
    got, want = _run_both(
        xyz1, xyz2, idx_hw, (3, 3), 6, (2, 2), 5.0, True, True
    )
    _check(got, want, 6)


def test_spherical_project_nearest_wins():
    # two points mapping to the same cell: the nearer one must win
    xyz = np.zeros((1, 3, 3), np.float32)
    xyz[0, 0] = [10.0, 0.0, 0.0]  # far
    xyz[0, 1] = [5.0, 0.0, 0.0]  # near, same direction -> same cell
    xyz[0, 2] = [0.0, 0.0, 0.0]  # padding, must never win
    feats = np.array([[[1.0], [2.0], [3.0]]], np.float32)
    xyz_proj, (f_proj,) = PR.spherical_project(
        jnp.array(xyz), [jnp.array(feats)], H=4, W=8, fup=15.0, fdown=-15.0
    )
    xyz_proj = np.asarray(xyz_proj)
    f_proj = np.asarray(f_proj)
    occupied = np.abs(xyz_proj).sum(-1) > 0
    assert occupied.sum() == 1
    cell = np.argwhere(occupied)[0]
    np.testing.assert_allclose(xyz_proj[tuple(cell)], [5.0, 0.0, 0.0])
    np.testing.assert_allclose(f_proj[tuple(cell)], [2.0])


def test_spherical_project_matches_reference_cell_mapping():
    """Row/col formulas equal the reference's (ref utils.py:126-155)."""
    rng = np.random.default_rng(2)
    N = 256
    xyz = rng.normal(size=(1, N, 3)).astype(np.float32) * 10
    H, W, fup, fdown = 16, 100, 2.0, -24.8
    xyz_proj, _ = PR.spherical_project(jnp.array(xyz), [], H, W, fup, fdown)
    xyz_proj = np.asarray(xyz_proj)

    # numpy re-derivation (torch .long() truncation == floor for >=0 and the
    # clamp makes boundary behavior identical)
    az = 2 * np.pi / W
    vres = (fup - fdown) * np.pi / 180 / (H - 1)
    voff = -(fdown * np.pi / 180) / vres
    r = np.linalg.norm(xyz[0], axis=-1)
    col = np.clip(((np.pi - np.arctan2(xyz[0, :, 1], xyz[0, :, 0])) / az).astype(
        np.int64), 0, W - 1)
    row = np.clip(H - (np.arcsin(xyz[0, :, 2] / r) / vres + voff).astype(np.int64),
                  0, H - 1)
    # for every occupied cell, the stored point must be one of the points
    # mapping there with minimal range
    occ = np.argwhere(np.abs(xyz_proj[0]).sum(-1) > 0)
    assert len(occ) > 10
    for (rr, cc) in occ[:50]:
        members = np.where((row == rr) & (col == cc))[0]
        assert len(members) > 0
        rmin = r[members].min()
        stored = xyz_proj[0, rr, cc]
        match = members[np.all(np.isclose(xyz[0, members], stored), axis=-1)]
        assert len(match) >= 1
        np.testing.assert_allclose(r[match[0]], rmin, rtol=1e-6)


def test_grid_helpers():
    idx = np.asarray(PR.grid_indices(1, 2, 3))
    np.testing.assert_array_equal(
        idx[0], [[0, 0], [0, 1], [0, 2], [1, 0], [1, 1], [1, 2]]
    )
    sidx = np.asarray(PR.strided_grid_indices(1, 2, 2, 2, 3))
    np.testing.assert_array_equal(sidx[0], [[0, 0], [0, 3], [2, 0], [2, 3]])
    feat = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    g = np.asarray(
        PR.gather_grid(feat, jnp.array([[2, 0]]), jnp.array([[3, 1]]))
    )
    np.testing.assert_array_equal(g[..., 0], [[11.0, 1.0]])
    ds = np.asarray(PR.strided_downsample(feat, 2, 2, 2, 2))
    np.testing.assert_array_equal(ds[0, :, :, 0], [[0, 2], [8, 10]])
    v = np.asarray(PR.check_valid(jnp.array([[[0.0, 0, 0], [1, 0, 0]]])))
    np.testing.assert_array_equal(v[..., 0], [[0.0, 1.0]])


@pytest.mark.parametrize("patches", ["0", "1"])
def test_grid_window_select_matches_generic(patches, monkeypatch):
    """The slice-structured fast path must match the generic gather path
    (same masks; same selected features wherever mask=1) — with and without
    the opt-in im2col candidate builder (I2PNET_GRID_PATCHES)."""
    monkeypatch.setenv("I2PNET_GRID_PATCHES", patches)
    rng = np.random.default_rng(9)
    B, H, W = 2, 8, 16
    xyz = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    holes = rng.random((B, H, W)) < 0.3
    xyz[holes] = 0.0
    feat = rng.normal(size=(B, H, W, 5)).astype(np.float32)

    cases = [
        # (out_h, out_w, qstride, src_hw, stride, kernel, K, copy)
        (4, 8, (2, 2), (H, W), (1, 1), (3, 5), 4, True),    # downsample lvl
        (8, 16, (1, 1), (H, W), (1, 1), (3, 3), 4, False),  # cost-volume 3D
        (8, 16, (1, 1), (4, 8), (2, 2), (3, 3), 4, True),   # upconv
    ]
    for out_h, out_w, qstride, src_hw, stride, kernel, K, copy in cases:
        if src_hw == (H, W):
            src = xyz
            srcf = feat
        else:
            src = xyz[:, : src_hw[0] * 2 : 2, : src_hw[1] * 2 : 2]
            srcf = feat[:, : src_hw[0] * 2 : 2, : src_hw[1] * 2 : 2]
        idx_hw = np.asarray(
            PR.strided_grid_indices(B, out_h, out_w, qstride[0], qstride[1])
        )
        h_g, w_g, m_g = PR.window_neighbor_select(
            jnp.array(xyz), jnp.array(src), jnp.array(idx_hw), kernel, K,
            stride, 1.5, True, copy,
        )
        feats_g = PR.gather_grid(jnp.array(srcf), h_g, w_g)

        args, m_f = PR.window_neighbor_select_grid(
            jnp.array(xyz), jnp.array(src), out_h, out_w, qstride, kernel, K,
            stride, 1.5, True, copy,
        )
        feats_f = PR.select_window_features(
            jnp.array(srcf), args, out_h, out_w, qstride, stride, kernel, True
        )
        np.testing.assert_array_equal(np.asarray(m_g), np.asarray(m_f))
        # ALL slots must match, including no-hit/invalid sentinel gathers
        np.testing.assert_allclose(
            np.asarray(feats_g), np.asarray(feats_f), atol=1e-6
        )


def test_pixel_posinfo():
    K = jnp.asarray([[[50.0, 0, 8], [0, 50.0, 4], [0, 0, 1]]])
    out = np.asarray(PR.pixel_posinfo(1, 8, 16, K))
    assert out.shape == (1, 8, 16, 3)
    # pixel at the principal point maps to (0, 0, 1)
    np.testing.assert_allclose(out[0, 4, 8], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(out[0, 4, 58 % 16], [(58 % 16 - 8) / 50, 0, 1],
                               atol=1e-6)
