#!/usr/bin/env python
"""Production-scale forward parity vs the live torch reference.

Round-1 parity tests cover a tiny config only; this script runs the
comparison at the SHIPPED configs at least once and records the artifact
(docs/PARITY_FULL.md):

  * free-point: B=1, N=8192 points, 384x1280 image, all-pixel cost volume
    (ref src/modellearn.py:179-395 with src/config_lidarcenter.py)
  * projection: B=1, 150k raw points, 64x1800 grid, 160x512 image
    (ref src/modellearn_proj_center.py:216-424 with
    src/config_proj_lidarcenter.py)

Both sides run CPU f32 (exact KNN) so differences are purely math/layout.
The reference's CUDA ops are replaced by stubs: the free-point stubs are
the test suite's; the fused_conv stub here is a VECTORIZED numpy
transcription of fused_conv_go.cu:11-264 (the per-pixel python oracle in
tests/ is O(N*khw) python -> hours at 64x1800), cross-checked against the
loop oracle on a small random case before use.

Usage: python tools/parity_full_scale.py [--skip-proj] [--skip-free]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def vectorized_fused_conv_oracle(
    xyz1, xyz2, idx_hw, kernel, K, stride, distance, shift, copy
):
    """Vectorized numpy implementation of fused_conv_go.cu:11-264.

    xyz1 (B,H,W,3) query grid; xyz2 (B,h2,w2,3) source grid; idx_hw (B,N,2)
    query coords. Returns (h_idx, w_idx, mask) each (B,N,K) following the
    kernel's semantics: invalid/all-zero pixels and beyond-distance
    candidates rejected, stable top-K by 3D distance, FLAG_SHIFT wraps W
    and clamps H, FLAG_COPY replicates the nearest hit into empty slots,
    no-hit rows keep index (0,0) with mask 0.
    """
    B, N = idx_hw.shape[:2]
    h2, w2 = xyz2.shape[1:3]
    kh, kw = kernel
    khw = kh * kw
    m_off = np.arange(khw)
    dh = m_off // kw - kh // 2
    dw = m_off % kw - kw // 2

    hq = idx_hw[..., 0]  # (B, N)
    wq = idx_hw[..., 1]
    center = xyz1[np.arange(B)[:, None], hq, wq]  # (B, N, 3)
    center_valid = (center**2).sum(-1) > 1e-10

    ksh = hq[..., None] // stride[0] + dh  # (B, N, khw)
    ksw = wq[..., None] // stride[1] + dw
    row_ok = (ksh >= 0) & (ksh < h2)
    if shift:
        ksw_idx = np.mod(ksw, w2)
        col_ok = np.ones_like(ksw, bool)
    else:
        col_ok = (ksw >= 0) & (ksw < w2)
        ksw_idx = np.clip(ksw, 0, w2 - 1)
    ksh_idx = np.clip(ksh, 0, h2 - 1)

    q = xyz2[np.arange(B)[:, None, None], ksh_idx, ksw_idx]  # (B,N,khw,3)
    q_valid = (q**2).sum(-1) > 1e-10
    d = np.maximum(((center[:, :, None, :] - q) ** 2).sum(-1), 1e-10)
    ok = row_ok & col_ok & q_valid & (d <= distance * distance)
    ok &= center_valid[..., None]
    d = np.where(ok, d, 1e10)

    order = np.argsort(d, axis=-1, kind="stable")[..., :K]  # (B,N,K)
    d_sel = np.take_along_axis(d, order, axis=-1)
    hit = d_sel < 1e10
    h_out = np.where(hit, np.take_along_axis(ksh_idx, order, -1), 0)
    w_out = np.where(hit, np.take_along_axis(ksw_idx, order, -1), 0)
    m_out = hit.astype(np.float32)
    if copy:
        # FLAG_COPY (fused_conv_go.cu's s==0 pre-fill): non-hit slots take
        # the nearest hit's index (or 0 with no hit at all) and the mask is
        # ALL ones for every valid-center query
        any_hit = hit[..., :1]
        h_out = np.where(hit, h_out, np.where(any_hit, h_out[..., :1], 0))
        w_out = np.where(hit, w_out, np.where(any_hit, w_out[..., :1], 0))
        m_out = np.ones_like(m_out)
    cv = center_valid[..., None]
    h_out = np.where(cv, h_out, 0)
    w_out = np.where(cv, w_out, 0)
    m_out = np.where(cv, m_out, 0.0).astype(np.float32)
    return h_out.astype(np.int64), w_out.astype(np.int64), m_out


def _selfcheck_oracle():
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_parity_reference_proj import _fused_conv_oracle

    rng = np.random.default_rng(0)
    B, H, W = 2, 6, 12
    xyz1 = rng.normal(size=(B, H, W, 3)).astype(np.float32) * 3
    xyz1[rng.random((B, H, W)) < 0.3] = 0
    xyz2 = rng.normal(size=(B, 3, 6, 3)).astype(np.float32) * 3
    xyz2[rng.random((B, 3, 6)) < 0.3] = 0
    hh = rng.integers(0, H, (B, 10))
    ww = rng.integers(0, W, (B, 10))
    idx_hw = np.stack([hh, ww], -1)
    for shift in (True, False):
        for copy in (True, False):
            a = _fused_conv_oracle(
                xyz1, xyz2, idx_hw, (3, 5), 4, (2, 2), 4.0, shift, copy
            )
            b = vectorized_fused_conv_oracle(
                xyz1, xyz2, idx_hw, (3, 5), 4, (2, 2), 4.0, shift, copy
            )
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)
    print("fused_conv vectorized oracle == loop oracle on random case", flush=True)


def run_free_point():
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, REF)
    from test_parity_reference import _install_stubs

    _install_stubs()
    from src.config_lidarcenter import I2PNetConfig as RefCfg
    from src.modellearn import RegNet_v2

    torch.manual_seed(0)
    ref_model = RegNet_v2(cfg=RefCfg)
    ref_model.eval()

    rng = np.random.default_rng(0)
    B, N, H, W = 1, 8192, 384, 1280
    rgb = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    lidar = rng.uniform(-10, 10, size=(B, N, 3)).astype(np.float32)
    lidar[..., 2] += 20.0
    intrinsic = np.tile(
        np.array([[[718.0, 0, 640], [0, 718.0, 192], [0, 0, 1]]], np.float32),
        (B, 1, 1),
    )
    t0 = time.perf_counter()
    with torch.no_grad():
        out = ref_model(
            torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(lidar),
            None,
            torch.from_numpy(intrinsic),
            None,
            cfg=RefCfg,
            lidar_img_raw=torch.from_numpy(lidar),
        )
    print(f"reference forward: {time.perf_counter() - t0:.1f} s", flush=True)
    ref_out3, ref_out4 = out[0].numpy(), out[1].numpy()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_i2pnet")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from tools.convert_torch_checkpoint import convert_free_point

    variables = convert_free_point(sd)
    model = I2PNet(I2PNetConfig())
    t0 = time.perf_counter()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(rgb), jnp.asarray(lidar), jnp.asarray(intrinsic),
        train=False,
    )
    print(f"i2pnet_tpu forward: {time.perf_counter() - t0:.1f} s", flush=True)
    d3 = np.abs(np.asarray(got["out3"]) - ref_out3).max()
    d4 = np.abs(np.asarray(got["out4"]) - ref_out4).max()
    s3 = np.abs(ref_out3).max()
    s4 = np.abs(ref_out4).max()
    print(f"free-point FULL-SCALE parity: |Δout3|max={d3:.3e} (scale {s3:.3f}), "
          f"|Δout4|max={d4:.3e} (scale {s4:.3f})", flush=True)
    return {"out3_absdiff": float(d3), "out4_absdiff": float(d4),
            "out3_scale": float(s3), "out4_scale": float(s4)}


def run_proj(f64: bool = False):
    """f64: run BOTH sides in double precision. If the f32 delta is
    reduction-order roundoff (not a logic gap), it must collapse by orders
    of magnitude here — discrete decisions (spherical-grid binning, KNN
    selection) are computed in the working dtype on both sides, so they
    stay consistent. Used to bound the shipped-config 1.8e-3 proj delta
    (round-2 verdict item 5)."""
    import types

    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, REF)
    from test_parity_reference import _install_stubs as base_stubs

    base_stubs()

    # vectorized fused_conv stub (validated by _selfcheck_oracle above)
    mod = types.ModuleType("fused_conv_select_k_cuda")

    def fused_conv_select_k(xyz1, xyz2, idx_n2, random_hw, H, W, npoints,
                            kH, kW, K, flag, distance, stride_h, stride_w,
                            sb, sh, sw, valid_idx, valid_in_dis, smask,
                            small_h, small_w):
        shift = bool(flag & 0b0010)
        copy = bool(flag & 0b0001)
        h, w, m = vectorized_fused_conv_oracle(
            xyz1.numpy(), xyz2.numpy(), idx_n2.numpy().astype(np.int64),
            (kH, kW), K, (stride_h, stride_w), float(distance), shift, copy,
        )
        B = xyz1.shape[0]
        b_idx = np.broadcast_to(
            np.arange(B, dtype=np.int64)[:, None, None], h.shape
        )
        sb.copy_(torch.from_numpy(b_idx.copy())[..., None])
        sh.copy_(torch.from_numpy(h)[..., None])
        sw.copy_(torch.from_numpy(w)[..., None])
        smask.copy_(torch.from_numpy(m)[..., None])
        return None

    mod.fused_conv_select_k = fused_conv_select_k
    sys.modules["fused_conv_select_k_cuda"] = mod

    from src.config_proj_lidarcenter import I2PNetConfig as RefCfg

    RefCfg.debug_time = False  # keep the Timings instrumentation off
    from src.modellearn_proj_center import RegNet_v2

    torch.manual_seed(0)
    ref_model = RegNet_v2(cfg=RefCfg)
    ref_model.eval()
    if f64:
        ref_model.double()
        # the reference hard-casts intermediates with .float()
        # (modellearn_proj_center.py:222,247,416); redirect those to double
        # for this measurement so the whole torch graph runs in f64, and
        # let float factory calls (torch.zeros/ones/...) default to f64
        torch.Tensor.float = lambda self: self.to(torch.float64)
        torch.set_default_dtype(torch.float64)
        # projectPN/utils.py allocates with explicit dtype=torch.float32
        # (project_seq:169-171); upgrade those too
        for _name in ("zeros", "ones", "empty", "full"):
            _orig = getattr(torch, _name)

            def _wrap(*a, _orig=_orig, **k):
                if k.get("dtype") == torch.float32:
                    k["dtype"] = torch.float64
                return _orig(*a, **k)

            setattr(torch, _name, _wrap)

    rng = np.random.default_rng(1)
    B, N, H, W = 1, 150000, 160, 512
    n_real = 120000
    raw = rng.normal(size=(B, N, 3)).astype(np.float32) * 15
    raw[:, n_real:] = 0.0
    # decalibrated cloud: rotate+translate the raw cloud, keep pads zero
    ang = 0.08
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
        np.float32,
    )
    lidar = raw @ R.T + np.array([1.0, 0, 2.0], np.float32)
    lidar[:, n_real:] = 0.0
    rgb = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    intrinsic = np.tile(
        np.array([[[350.0, 0, 256], [0, 350.0, 80], [0, 0, 1]]], np.float32),
        (B, 1, 1),
    )
    if f64:
        rgb, lidar, raw = rgb.astype(np.float64), lidar.astype(np.float64), raw.astype(np.float64)
        intrinsic = intrinsic.astype(np.float64)
    t0 = time.perf_counter()
    with torch.no_grad():
        out = ref_model(
            torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(lidar),
            torch.from_numpy(raw),
            None,  # H_initial
            torch.from_numpy(intrinsic),
            None,  # resize_img
            cfg=RefCfg,
        )
    print(f"reference proj forward: {time.perf_counter() - t0:.1f} s", flush=True)
    ref_out3, ref_out4 = out[0].numpy(), out[1].numpy()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_i2pnet")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from i2pnet_tpu.config import I2PNetProjConfig
    from i2pnet_tpu.models import I2PNetProj
    from tools.convert_torch_checkpoint import convert_proj

    variables = convert_proj(sd)
    model = I2PNetProj(I2PNetProjConfig())
    t0 = time.perf_counter()
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(rgb), jnp.asarray(lidar), jnp.asarray(raw),
        jnp.asarray(intrinsic), train=False,
    )
    print(f"i2pnet_tpu proj forward: {time.perf_counter() - t0:.1f} s", flush=True)
    d3 = np.abs(np.asarray(got["out3"]) - ref_out3).max()
    d4 = np.abs(np.asarray(got["out4"]) - ref_out4).max()
    s3 = np.abs(ref_out3).max()
    s4 = np.abs(ref_out4).max()
    print(f"proj FULL-SCALE parity: |Δout3|max={d3:.3e} (scale {s3:.3f}), "
          f"|Δout4|max={d4:.3e} (scale {s4:.3f})", flush=True)
    return {"out3_absdiff": float(d3), "out4_absdiff": float(d4),
            "out3_scale": float(s3), "out4_scale": float(s4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-proj", action="store_true")
    ap.add_argument("--skip-free", action="store_true")
    ap.add_argument("--f64", action="store_true",
                    help="proj only: run BOTH sides in double precision to "
                    "bound the f32 delta as roundoff (prints; does not "
                    "rewrite PARITY_FULL.md's f32 table)")
    args = ap.parse_args()

    if args.f64:
        r = run_proj(f64=True)
        print(json.dumps({"proj_f64": r}))
        return

    _selfcheck_oracle()
    results = {}
    if not args.skip_free:
        results["free_point"] = run_free_point()
    if not args.skip_proj:
        results["proj"] = run_proj()

    lines = [
        "# Full-scale forward parity vs live torch reference",
        "",
        "Produced by `python tools/parity_full_scale.py` (CPU f32 both sides,",
        "shipped configs: free-point B=1/N=8192/384x1280; proj B=1/150k pts/",
        "64x1800 grid/160x512). Reference models random-initialized with",
        "torch.manual_seed(0); weights converted with",
        "tools/convert_torch_checkpoint.py.",
        "",
        "| model | max|Δout3| | max|Δout4| | output scale |",
        "|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['out3_absdiff']:.3e} | {r['out4_absdiff']:.3e} "
            f"| {max(r['out3_scale'], r['out4_scale']):.3f} |"
        )
    out_path = os.path.join(REPO, "docs", "PARITY_FULL.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
