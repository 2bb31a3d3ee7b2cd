"""Fused windowed-PointNet level kernel (Pallas, TPU).

Evaluates the dense multiplicity-weighted reformulation of
ProjectPointNet (ops/dense_window.py) entirely in VMEM: per query the
kernel walks the kh*kw+1 candidate slots (dw-plane layout, see
ops/select_pallas.py), builds the geometric feature rows, runs the MLP
on the MXU, applies the stateless BatchStatsNorm with PRECOMPUTED batch
statistics, and max-pools over the selected slots (multiplicity m > 0)
— no (B, N, K, C) grouped tensors, no gathers, no 6-D transposes.

BatchStatsNorm statistics couple every query in the batch, so the level
runs as L+1 kernel passes sharing one body:

    pass l (l = 1..L): recompute layers 1..l-1 with known stats, emit
        the m-weighted partial sums (sum m*x_l, sum m*x_l^2) of layer
        l's PRE-BN output per instance; the host reduces them (f64) to
        (mean_l, var_l).  FLOPs are the cheap resource here — the level
        is ~40 GFLOP against an HBM-bound 16+ ms native select/gather.
    final pass: full forward + masked max -> (B, out_h, out_w, C_L).

Semantics match ProjectPointNet with use_bn=True / bn_stats=False
(ref PPBackbone_center.py:54-199): center/default/dist feature modes,
Dense in the compute dtype (bf16 rounding points preserved), BN eps,
relu, sentinel slot = the grids' (0, 0) pixel.  Differences from the
gathered path are reduction-order-only (weighted vs gathered BN sums,
f32 accumulation); the selection multiset itself is bit-exact via
ops/select_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i2pnet_tpu.nn.layers import BN_EPS
from i2pnet_tpu.ops.projection import strided_downsample
from i2pnet_tpu.ops.select_pallas import (
    _pad_lanes,
    selection_multiplicity_pallas,
)

__all__ = ["dense_pointnet_fused"]


def _pad8(c: int) -> int:
    return ((c + 7) // 8) * 8


def _mlp_body(
    planes_ref, ctr_ref, sent_ref, m_ref, w_ref, aux_ref,
    out_ref,
    *, mode, Cg, Cin, couts, qh, kh, kw, h2, to, upto, use_bf16, eps,
):
    """Shared body for stat passes (upto >= 1) and the final pass
    (upto == 0 -> all layers + masked max).

    planes (1, kw, Cg, h2p, Wp); ctr (1, 6, to, Wp) rows [ctr(3),
    center_points(3)] per out-row; sent (1, Cg_p8, 8, Wp) rows 0..Cg-1;
    m (1, to, S+1, Wp); w (L, Cout_max_p8, Cin_max_p) per-layer weights
    stored TRANSPOSED (cout sublanes, cin lanes — no in-kernel
    transposes); aux (L, Cout_max_p8, 128) channel-on-sublane packing,
    lanes [dense bias, bn scale, bn bias, mean, var]; out: stat partials
    (1, 1, 2*cs_p8, Wp) rows [sum m*x | sum m*x^2] (host reduces lanes)
    or final (1, to, Cout_L_p8, Wp). Everything stays >= 2-D.
    """
    S = kh * kw
    Wp = planes_ref.shape[-1]
    rb = pl.program_id(1)
    L_run = len(couts) if upto == 0 else upto
    if upto != 0:
        c_stat = couts[L_run - 1]
        acc1 = jnp.zeros((c_stat, Wp), jnp.float32)
        acc2 = jnp.zeros((c_stat, Wp), jnp.float32)

    for r in range(to):
        orow = rb * to + r
        ctr = ctr_ref[0, :, r, :]  # (6, Wp): src center rows 0-2, warped 3-5

        pooled = None
        if upto == 0:
            pooled = jnp.full((couts[-1], Wp), -jnp.inf, jnp.float32)

        def slot_feat(s_dh, s_dw, sentinel):
            if sentinel:
                cand = sent_ref[0, :Cg, 0, :].reshape(Cg, Wp)
            else:
                # m already encodes slot validity; just read the rows
                grow = orow * qh + s_dh
                cand = planes_ref[
                    0, pl.dslice(s_dw, 1), :, pl.dslice(grow, 1), :
                ].reshape(Cg, Wp)
            gn = cand[:3] - ctr[:3]
            if mode in ("center", "dist"):
                sumsq = (gn[0:1] * gn[0:1] + gn[1:2] * gn[1:2]
                         + gn[2:3] * gn[2:3])
                dist = jnp.where(sumsq > 0, jnp.sqrt(
                    jnp.where(sumsq > 0, sumsq, 1.0)), 0.0)  # (1, Wp)
            if mode == "center":
                rows = [gn, ctr[3:6], cand[:3], dist]
                if Cg > 3:
                    rows.append(cand[3:])
            elif mode == "dist":
                rows = [dist]
            else:
                rows = [gn, cand[3:]]
            x = jnp.concatenate(rows, axis=0)  # (Cin, Wp)
            return x

        def run_mlp(x):
            """layers 1..L_run; returns layer L_run's pre-BN output and,
            for the final pass, the post-BN/relu output of layer L."""
            cin = Cin
            for li in range(L_run):
                cout = couts[li]
                wt = w_ref[li, :cout, :cin]  # (cout, cin) f32
                bias = aux_ref[li, :cout, 0:1]  # (cout, 1)
                if use_bf16:
                    # native semantics: bf16 dot (f32 accum, bf16 round),
                    # bias added in bf16, then f32 for BN
                    y = jax.lax.dot_general(
                        wt.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                    y = (y + bias.astype(jnp.bfloat16)).astype(jnp.float32)
                else:
                    y = jax.lax.dot_general(
                        wt, x, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    y = y + bias
                if li == L_run - 1 and upto != 0:
                    return y  # pre-BN output of the stat layer
                mean = aux_ref[li, :cout, 3:4]
                var = aux_ref[li, :cout, 4:5]
                z = (y - mean) * jax.lax.rsqrt(var + eps)
                z = z * aux_ref[li, :cout, 1:2] + aux_ref[li, :cout, 2:3]
                x = jnp.maximum(z, 0.0)
                cin = cout
            return x

        # regular slots via fori_loop (bounds compiled code size); the
        # sentinel slot unrolled once after
        if upto != 0:
            def body(s, accs):
                a1, a2 = accs
                s_dh = s // kw
                s_dw = s - s_dh * kw
                x = run_mlp(slot_feat(s_dh, s_dw, False))  # (c_stat, Wp)
                mrow = m_ref[0, r, pl.dslice(s, 1), :]  # (1, Wp)
                return a1 + x * mrow, a2 + x * x * mrow

            acc1, acc2 = jax.lax.fori_loop(0, S, body, (acc1, acc2))
            x = run_mlp(slot_feat(0, 0, True))
            mrow = m_ref[0, r, S:S + 1, :]
            acc1 = acc1 + x * mrow
            acc2 = acc2 + x * x * mrow
        else:
            def body(s, pooled):
                s_dh = s // kw
                s_dw = s - s_dh * kw
                x = run_mlp(slot_feat(s_dh, s_dw, False))
                mrow = m_ref[0, r, pl.dslice(s, 1), :]
                return jnp.maximum(
                    pooled, jnp.where(mrow > 0, x, -jnp.inf))

            pooled = jax.lax.fori_loop(0, S, body, pooled)
            x = run_mlp(slot_feat(0, 0, True))
            mrow = m_ref[0, r, S:S + 1, :]
            pooled = jnp.maximum(pooled, jnp.where(mrow > 0, x, -jnp.inf))
            out_ref[0, r, :couts[-1], :] = pooled
            if out_ref.shape[2] > couts[-1]:
                out_ref[0, r, couts[-1]:, :] = jnp.zeros(
                    (out_ref.shape[2] - couts[-1], Wp), jnp.float32)

    if upto != 0:
        cs8 = out_ref.shape[2] // 2
        out_ref[0, 0, :c_stat, :] = acc1
        out_ref[0, 0, cs8:cs8 + c_stat, :] = acc2
        if cs8 > c_stat:
            z = jnp.zeros((cs8 - c_stat, Wp), jnp.float32)
            out_ref[0, 0, c_stat:cs8, :] = z
            out_ref[0, 0, cs8 + c_stat:, :] = z


@functools.lru_cache(maxsize=None)
def _make_pass(B, out_h, out_w, qh, kh, kw, h2, Cg, Cin, couts, mode,
               upto, use_bf16, eps, interpret):
    Wp = _pad_lanes(out_w)
    S = kh * kw
    h2p = h2 + 2 * (kh // 2)
    L = len(couts)
    cmax8 = _pad8(max(couts))
    cin_max = _pad_lanes(max([Cin] + list(couts)))
    to = out_h
    planes_b = kw * Cg * h2p * Wp * 4
    while to > 1 and planes_b + to * (S + 1) * Wp * 4 > 9_000_000:
        to //= 2
    while out_h % to:
        to -= 1
    nb = out_h // to
    kern = functools.partial(
        _mlp_body, mode=mode, Cg=Cg, Cin=Cin, couts=couts, qh=qh,
        kh=kh, kw=kw, h2=h2, to=to, upto=upto, use_bf16=use_bf16, eps=eps,
    )
    in_specs = [
        pl.BlockSpec((1, kw, Cg, h2p, Wp), lambda b, i: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 6, to, Wp), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _pad8(Cg), 8, Wp), lambda b, i: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, to, S + 1, Wp), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, cmax8, cin_max), lambda b, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, cmax8, 128), lambda b, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if upto != 0:
        cs8 = _pad8(couts[upto - 1])
        out_spec = pl.BlockSpec((1, 1, 2 * cs8, Wp),
                                lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, nb, 2 * cs8, Wp), jnp.float32)
    else:
        cl = _pad8(couts[-1])
        out_spec = pl.BlockSpec((1, to, cl, Wp), lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, out_h, cl, Wp), jnp.float32)
    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )


def dense_pointnet_fused(
    xyz_raw: jnp.ndarray,
    xyz: jnp.ndarray,
    feature: jnp.ndarray,
    params,
    *,
    out_h: int,
    out_w: int,
    stride_h: int,
    stride_w: int,
    kernel_size: Tuple[int, int],
    nsample: int,
    distance: float,
    mlp: Sequence[int],
    center_mode: bool = False,
    dist_mode: bool = False,
    using_intens: bool = False,
    raw_feat_point: bool = True,
    use_trans: bool = True,
    dtype: Optional[jnp.dtype] = None,
    eps: float = BN_EPS,
    interpret: bool = False,
):
    """ProjectPointNet.__call__ evaluated via the fused Pallas passes.

    Same signature/returns as dense_window.dense_pointnet_eval.
    """
    B, h2, w2, _ = xyz.shape
    N = out_h * out_w
    kh, kw = kernel_size
    S = kh * kw
    Wp = _pad_lanes(out_w)
    new_xyz = strided_downsample(xyz, out_h, out_w, stride_h, stride_w)
    new_xyz_raw = strided_downsample(xyz_raw, out_h, out_w, stride_h, stride_w)
    xyz_pr = xyz if use_trans else xyz_raw
    src = xyz_raw if raw_feat_point else xyz
    ctr_src = new_xyz_raw if raw_feat_point else new_xyz

    # selection multiplicities (Pallas), pad lanes zeroed for the stats
    m = selection_multiplicity_pallas(
        xyz_pr, out_h=out_h, out_w=out_w, qstride=(stride_h, stride_w),
        kernel_size=kernel_size, K=nsample, distance=distance,
        interpret=interpret, raw_layout=True,
    )  # (B, out_h, S+1, Wp)
    lane = jnp.arange(Wp)
    m = jnp.where(lane[None, None, None, :] < out_w, m, 0.0)

    # geometry source planes: src xyz (+ feature channels when the MLP
    # consumes them)
    needs_feat = (not center_mode and not dist_mode) or (
        center_mode and using_intens)
    g = src if not needs_feat else jnp.concatenate([src, feature], axis=-1)
    Cg = g.shape[-1]
    gt = jnp.transpose(g, (0, 3, 1, 2)).astype(jnp.float32)
    gt = jnp.pad(gt, ((0, 0), (0, 0), (0, 0), (kw // 2, kw // 2)),
                 mode="wrap")
    planes = jnp.stack(
        [
            jax.lax.slice(
                gt, (0, 0, 0, dw),
                (B, Cg, h2, dw + (out_w - 1) * stride_w + 1),
                (1, 1, 1, stride_w),
            )
            for dw in range(kw)
        ],
        axis=1,
    )
    planes = jnp.pad(
        planes,
        ((0, 0), (0, 0), (0, 0), (kh // 2, kh // 2), (0, Wp - out_w)),
    )

    # per-query center rows: src center (3) + warped center (3)
    ctr = jnp.concatenate([
        ctr_src.reshape(B, out_h, out_w, 3),
        new_xyz.reshape(B, out_h, out_w, 3),
    ], axis=-1)
    ctr = jnp.transpose(ctr, (0, 3, 1, 2)).astype(jnp.float32)
    ctr = jnp.pad(ctr, ((0, 0), (0, 0), (0, 0), (0, Wp - out_w)))

    # sentinel candidate: the grids' (0, 0) pixel, broadcast over lanes
    sent = jnp.broadcast_to(
        g[:, 0, 0, :].astype(jnp.float32)[:, :, None, None],
        (B, Cg, 8, Wp))
    sent = jnp.pad(sent, ((0, 0), (0, _pad8(Cg) - Cg), (0, 0), (0, 0)))

    # packed params
    L = len(mlp)
    if center_mode:
        Cin = 10 + (Cg - 3 if using_intens else 0)
    elif dist_mode:
        Cin = 1
    else:
        Cin = 3 + (Cg - 3)
    cmax8 = _pad8(max(mlp))
    cin_max = _pad_lanes(max([Cin] + list(mlp)))
    # weights transposed (cout sublanes, cin lanes); aux channel-on-
    # sublane with lanes [bias, scale, bn bias, mean, var]
    Ws = jnp.zeros((L, cmax8, cin_max), jnp.float32)
    aux = jnp.zeros((L, cmax8, 128), jnp.float32)
    cin = Cin
    for i, f in enumerate(mlp):
        p = params["mlp_convs"][f"PointwiseConv_{i}"]
        Ws = Ws.at[i, :f, :cin].set(
            p["Dense_0"]["kernel"].astype(jnp.float32).T)
        aux = aux.at[i, :f, 0].set(p["Dense_0"]["bias"].astype(jnp.float32))
        aux = aux.at[i, :f, 1].set(
            p["BatchStatsNorm_0"]["scale"].astype(jnp.float32))
        aux = aux.at[i, :f, 2].set(
            p["BatchStatsNorm_0"]["bias"].astype(jnp.float32))
        cin = f

    mode = "center" if center_mode else ("dist" if dist_mode else "default")
    use_bf16 = dtype == jnp.bfloat16
    total = float(B * N * nsample)
    couts = tuple(mlp)

    # stat passes: partials (B, nb, 2*cs8, Wp); lanes reduced host-side
    for li in range(1, L + 1):
        call = _make_pass(B, out_h, out_w, stride_h, kh, kw, h2, Cg, Cin,
                          couts, mode, li, use_bf16, eps, interpret)
        part = call(planes, ctr, sent, m, Ws, aux)
        c = couts[li - 1]
        cs8 = part.shape[2] // 2
        s1 = jnp.sum(part[:, :, :c, :], axis=(0, 1, 3))
        s2 = jnp.sum(part[:, :, cs8:cs8 + c, :], axis=(0, 1, 3))
        mean = s1 / total
        var = jnp.maximum(s2 / total - mean * mean, 0.0)
        aux = aux.at[li - 1, :c, 3].set(mean.astype(jnp.float32))
        aux = aux.at[li - 1, :c, 4].set(var.astype(jnp.float32))

    call = _make_pass(B, out_h, out_w, stride_h, kh, kw, h2, Cg, Cin,
                      couts, mode, 0, use_bf16, eps, interpret)
    out = call(planes, ctr, sent, m, Ws, aux)  # (B, out_h, cl, Wp)
    out = out[:, :, :couts[-1], :out_w]
    new_feat = jnp.transpose(out, (0, 1, 3, 2))
    return new_xyz_raw, new_xyz, new_feat
