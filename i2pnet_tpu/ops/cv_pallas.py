"""Fused eval-mode all-pixels CostVolume kernel (TPU Pallas).

The free-point cv1 (ref MainModules.py:51-210, nsample_q == -1) is the
single hottest non-encoder module: its pi-side materializes ~10 big
(B, N, K, C) tensors in HBM (corr product, 262-ch concat, mlp1/mlp2
hiddens, softmax weights). At EVAL the BatchNorms use running statistics,
so every layer folds to an affine Dense — the whole chain

    corr = pi_norm (x) qi_norm              (elementwise product)
    mlp1: 262 -> H1 -> H2 -> H3  (leaky, BN-folded)
    e    = leaky(pi_encoding(xyz pair))     (6 -> E, BN-folded)
    mlp2: [e, h3] -> G1 -> G2    (leaky, BN-folded)
    WQ   = softmax_k(g2);  out = sum_k WQ * h3

becomes a per-(n, k) feedforward whose inputs are only the SMALL
(B, N, C)/(B, K, C) factors. This kernel keeps a whole (K, *) slab in
VMEM per query point and runs the chain on the MXU — nothing (B, N, K, *)
ever touches HBM.

Layer-1/pi-encoding decompositions (exact, the concat splits the Dense):
    y1[n,k] = corr[n,k] @ W1c + t_pi[n] + t_qi[k]
      t_pi = pi_xyz @ W1[0:3]           (computed in XLA, (B, N, H1))
      t_qi = qi_xyz @ W1[3:6] + respond @ W1[6+C:] + b1'   ((B, K, H1))
    e[n,k] = leaky(e_pi[n] + e_qi[k])   (pi_encoding 6ch split the same way)
and the backward-validation response factorizes exactly at the VALUE
level (qi_norm is constant over n):
    respond[k] = qi_norm[k] >= 0 ? qi_norm[k]*max_n(pi_norm)
                                 : qi_norm[k]*min_n(pi_norm)
(the winning product is the same fp multiply; no (B,N,K,C) max pass).

Eval-only: training keeps the native XLA path (train-mode BN needs batch
statistics; see BASELINE.md round-5 for the attribution that motivated
this kernel). Guarded by the standard multi-device matrix
(nn/layers.py _fused_mode, env I2PNET_FUSED_CV).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i2pnet_tpu.nn.layers import BN_EPS

__all__ = ["fused_cv1_eval_supported", "fused_cv1_eval"]


def _leaky(x):
    # LeakyReLU(0.1) == max(x, 0.1x) for slope in (0, 1): no bf16 compare
    # (Mosaic v5e rejects bf16 cmpf; max is fine — see BASELINE round-4f)
    return jnp.maximum(x, x * jnp.asarray(0.1, x.dtype))


def _cv1_kernel(pn_ref, tpi_ref, epi_ref, qn_ref, tqi_ref, eqi_ref,
                w1c_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                v1a_ref, v1b_ref, v1_ref, v2_ref, v2b_ref,
                out_ref, *, Tn, K):
    """One (batch, n-tile) instance. All refs VMEM.

    pn (1,Tn,C) bf16; tpi (1,Tn,H1) f32; epi (1,Tn,E) f32;
    qn (1,K,C) bf16; tqi (1,K,H1) f32; eqi (1,K,E) f32;
    weights bf16, biases f32 (1,·); out (1,Tn,H3) f32.
    """
    f32 = jnp.float32
    qn = qn_ref[0]            # (K, C) bf16
    tqi = tqi_ref[0]          # (K, H1) f32
    eqi = eqi_ref[0]          # (K, E) f32

    # STATIC n unroll: Mosaic's AOT compiler requires dynamic sublane
    # (dim-1) slice indices to be provably 8-aligned — a fori_loop with
    # pl.dslice(n, 1) exports fine but fails the chip compile ("cannot
    # statically prove that index in dimension 1 is a multiple of 8").
    for n in range(Tn):
        pn_row = pn_ref[0, n:n + 1, :]                  # (1, C) bf16
        corr = qn * pn_row                              # (K, C) bf16
        y1 = jax.lax.dot_general(
            corr, w1c_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        y1 = y1 + tqi + tpi_ref[0, n:n + 1, :]
        h1 = _leaky(y1).astype(jnp.bfloat16)            # (K, H1)
        y2 = jax.lax.dot_general(
            h1, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b2_ref[...]
        h2 = _leaky(y2).astype(jnp.bfloat16)            # (K, H2)
        y3 = jax.lax.dot_general(
            h2, w3_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + b3_ref[...]
        h3 = _leaky(y3)                                 # (K, H3) f32
        h3b = h3.astype(jnp.bfloat16)

        e = _leaky(eqi + epi_ref[0, n:n + 1, :]).astype(jnp.bfloat16)
        g1 = jax.lax.dot_general(
            e, v1a_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + jax.lax.dot_general(
            h3b, v1b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + v1_ref[...]
        g1 = _leaky(g1).astype(jnp.bfloat16)            # (K, G1)
        g2 = jax.lax.dot_general(
            g1, v2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ) + v2b_ref[...]
        g2 = _leaky(g2)                                 # (K, G2) f32

        # per-channel softmax over K + weighted sum of h3 (G2 == H3)
        m = jnp.max(g2, axis=0, keepdims=True)          # (1, G2)
        w = jnp.exp(g2 - m)                             # (K, G2)
        s = jnp.sum(w, axis=0, keepdims=True)
        out_ref[0, n:n + 1, :] = (
            jnp.sum(w * h3, axis=0, keepdims=True) / s)


@functools.lru_cache(maxsize=None)
def _make_cv1(B, N, K, C, H1, H2, H3, E, G1, G2, Tn, interpret):
    kern = functools.partial(_cv1_kernel, Tn=Tn, K=K)
    nb = N // Tn
    f32 = jnp.float32

    def nblock(shape):
        return pl.BlockSpec((1,) + shape, lambda b, i: (b, i, 0),
                            memory_space=pltpu.VMEM)

    def bblock(shape):
        return pl.BlockSpec((1,) + shape, lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def wblock(shape):
        return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[
            nblock((Tn, C)), nblock((Tn, H1)), nblock((Tn, E)),
            bblock((K, C)), bblock((K, H1)), bblock((K, E)),
            wblock((C, H1)), wblock((H1, H2)), wblock((1, H2)),
            wblock((H2, H3)), wblock((1, H3)),
            wblock((E, G1)), wblock((H3, G1)), wblock((1, G1)),
            wblock((G1, G2)), wblock((1, G2)),
        ],
        out_specs=nblock((Tn, H3)),
        out_shape=jax.ShapeDtypeStruct((B, N, H3), f32),
        interpret=interpret,
    )


def _fold(pw_params, pw_stats):
    """BN-fold one PointwiseConv: y = (xW+b)*s + t with s,t from the eval
    running stats (same recipe as ops/conv_pallas.py eval folding)."""
    k = pw_params["Dense_0"]["kernel"].astype(jnp.float32)
    b = pw_params["Dense_0"]["bias"].astype(jnp.float32)
    g = pw_params["BatchNorm_0"]["scale"].astype(jnp.float32)
    beta = pw_params["BatchNorm_0"]["bias"].astype(jnp.float32)
    mu = pw_stats["BatchNorm_0"]["mean"].astype(jnp.float32)
    var = pw_stats["BatchNorm_0"]["var"].astype(jnp.float32)
    s = g * jax.lax.rsqrt(var + BN_EPS)
    return k * s[None, :], (b - mu) * s + beta


def _mean_std_normalize(x, eps=1e-12):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(
        x.shape[-1] - 1, 1)
    return (x - mean) / jnp.clip(jnp.sqrt(var), min=eps)


def fused_cv1_eval_supported(mlp1, mlp2, C: int) -> bool:
    """Shape gate: mlp1 depth 3, mlp2 depth 2, attention channels match
    (G2 == H3 — the softmax weights multiply h3 elementwise)."""
    return len(mlp1) == 3 and len(mlp2) == 2 and mlp2[-1] == mlp1[-1]


def fused_cv1_eval(
    pi_xyz: jnp.ndarray,     # (B, N, 3) depth-restored warped points, f32
    pi_feat: jnp.ndarray,    # (B, N, C) lidar features, f32
    qi_xyz: jnp.ndarray,     # (B, K, 3) pixel plane coords, f32
    qi_feat: jnp.ndarray,    # (B, K, C) image features, f32
    params, stats,
    *,
    bval: bool,
    interpret: bool = False,
    dp_axis: Optional[str] = None,
) -> jnp.ndarray:
    """pi-side of the all-pixels CostVolume at eval -> (B, N, H3) f32.

    params/stats: the CostVolume module's variable subtrees (mlp1_convs/
    PointwiseConv_i, pi_encoding, mlp2_convs). dp_axis: run per-shard
    under jax.shard_map over that ambient pure-DP mesh axis (per-example
    kernel, no collective).
    """
    B, N, C = pi_feat.shape
    K = qi_feat.shape[1]

    l1 = params["mlp1_convs"]["PointwiseConv_0"]
    l2 = params["mlp1_convs"]["PointwiseConv_1"]
    l3 = params["mlp1_convs"]["PointwiseConv_2"]
    s1 = stats["mlp1_convs"]["PointwiseConv_0"]
    s2 = stats["mlp1_convs"]["PointwiseConv_1"]
    s3 = stats["mlp1_convs"]["PointwiseConv_2"]
    W1, b1 = _fold(l1, s1)
    W2, b2 = _fold(l2, s2)
    W3, b3 = _fold(l3, s3)
    WE, bE = _fold(params["pi_encoding"], stats["pi_encoding"])
    V1, v1 = _fold(params["mlp2_convs"]["PointwiseConv_0"],
                   stats["mlp2_convs"]["PointwiseConv_0"])
    V2, v2 = _fold(params["mlp2_convs"]["PointwiseConv_1"],
                   stats["mlp2_convs"]["PointwiseConv_1"])
    H1, H2, H3 = W1.shape[1], W2.shape[1], W3.shape[1]
    E, G1, G2 = WE.shape[1], V1.shape[1], V2.shape[1]

    pn = _mean_std_normalize(pi_feat)
    qn = _mean_std_normalize(qi_feat)

    # layer-1 concat split: [pi_xyz(3), qi_xyz(3), corr(C), respond(C)]
    t_pi = pi_xyz @ W1[0:3]                              # (B, N, H1)
    t_qi = qi_xyz @ W1[3:6] + b1[None, None, :]          # (B, K, H1)
    if bval:
        # exact factorization of max_n(pi_norm * qi_norm): qi_norm is
        # constant over n, so the winner's product is qi*max_n(pi) for
        # qi >= 0 and qi*min_n(pi) otherwise — same fp multiply as the
        # dense max's winning element
        maxp = jnp.max(pn, axis=1, keepdims=True)        # (B, 1, C)
        minp = jnp.min(pn, axis=1, keepdims=True)
        respond = jnp.where(qn >= 0, qn * maxp, qn * minp)
        t_qi = t_qi + respond @ W1[6 + C:]
    # pi_encoding split: [pi_xyz(3), qi_xyz(3)] -> E
    e_pi = pi_xyz @ WE[0:3]                              # (B, N, E)
    e_qi = qi_xyz @ WE[3:6] + bE[None, None, :]          # (B, K, E)

    # Tn bounds the static unroll (Mosaic needs static sublane indices);
    # 32 keeps the kernel body a manageable ~200 ops
    Tn = next(t for t in (32, 16, 8, 4, 2, 1) if N % t == 0)
    bf = jnp.bfloat16

    def run(pn_, tpi_, epi_, qn_, tqi_, eqi_):
        b_ = pn_.shape[0]
        kcall = _make_cv1(b_, N, K, C, H1, H2, H3, E, G1, G2, Tn, interpret)
        return kcall(
            pn_.astype(bf), tpi_, epi_, qn_.astype(bf), tqi_, eqi_,
            W1[6:6 + C].astype(bf), W2.astype(bf), b2[None, :],
            W3.astype(bf), b3[None, :],
            V1[:E].astype(bf), V1[E:].astype(bf), v1[None, :],
            V2.astype(bf), v2[None, :],
        )

    args = (pn, t_pi, e_pi, qn, t_qi, e_qi)
    if dp_axis is not None:
        from jax.sharding import PartitionSpec as _P

        # check_vma off: pallas_call carries no varying-mesh-axes info
        return jax.shard_map(
            run, in_specs=(_P(dp_axis),) * 6, out_specs=_P(dp_axis),
            check_vma=False,
        )(*args)
    return run(*args)
