"""Training-mode fused encoder kernels (ops/conv_pallas_train.py) —
interpret-mode tests vs native XLA autodiff.

Covers the three Pallas pieces independently:

- ``conv_phase`` forward vs ``lax.conv_general_dilated`` and its two
  adjoints: dx via the spatially-flipped transposed kernel, dw via
  ``conv_phase_dw`` + ``unpack_dw``.
- ``bn_pool`` (scale/shift -> LeakyReLU -> bf16 -> 3x3 max-pool) forward
  bit-exactness and its custom VJP, including first-max tie routing
  (validated against ``select_and_scatter_add`` with a straight-through
  bf16 rounding so the reference's cotangent stays f32: the kernel
  accumulates the pool backward in f32, which is strictly more accurate
  than the native bf16-cotangent path — see the module docstring).

Reference semantics: basicConv.py:6-20 (conv+BN+LeakyReLU+pool).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from i2pnet_tpu.ops.conv_pallas import _pad_cin
from i2pnet_tpu.ops.conv_pallas_train import (
    bn_pool,
    conv_phase,
    conv_phase_dw,
    flip_transpose_kernel,
    pack_block_weights,
    stage_supported_train,
    unpack_dw,
)


def test_stage_supported_train_predicate():
    # the shipped free-point config at 384x1280 must take the fused train
    # path at every stage (the perf win depends on it; a predicate edit
    # that starts rejecting these shapes would silently fall back native)
    stages = (
        (3, (16, 16, 16, 16, 32), (2, 1, 1, 1, 2)),
        (32, (32, 32, 32, 32, 64), (2, 1, 1, 1, 2)),
        (64, (64, 64, 64, 64, 128), (1, 1, 1, 1, 2)),
    )
    for (H, W) in ((384, 1280), (160, 512)):
        h, w = H, W
        for cin, chans, strides in stages:
            assert stage_supported_train(h, w, cin, chans, strides), (h, w)
            for s in strides:
                h, w = h // s, w // s
    # the shipped proj config (W=1800) fails the phase-count divisibility
    # at stage 0/1 and must report unsupported (native fallback, not a
    # compile error)
    assert not stage_supported_train(64, 1800, 3, stages[0][1], stages[0][2])
    # W not divisible by the dx phase count; odd H under stride 2
    assert not stage_supported_train(16, 12, 16, (16,), (1,))
    assert not stage_supported_train(15, 32, 16, (16,), (2,))


def merge(x4):
    B, H, W, C = x4.shape
    return x4.reshape(B, H, W * C)


def unmerge(xm, C):
    B, H, L = xm.shape
    return xm.reshape(B, H, L // C, C)


def ref_conv(x4f, wf, bf):
    """f32 conv over bf16-exact values == bf16 conv with f32 accumulation
    (bf16 x bf16 products are exact in f32), modulo reduction order."""
    out = jax.lax.conv_general_dilated(
        x4f, wf, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bf


CONV_CASES = [
    (2, 16, 32, 8, 8),
    (2, 16, 32, 8, 16),
    (1, 8, 32, 4, 8),     # first block (cin 3 padded to 4)
    (2, 16, 64, 16, 32),
    (1, 16, 32, 32, 16),
    (1, 16, 16, 64, 64),
    (1, 8, 16, 64, 128),  # production stage-2 widening block (P=2)
]


@pytest.mark.parametrize("B,H,W,cin,cout", CONV_CASES)
def test_conv_phase_fwd_dx_dw(B, H, W, cin, cout):
    rng = np.random.default_rng(0)
    P = max(128 // cin, 128 // cout)
    x4 = jnp.asarray(rng.standard_normal((B, H, W, cin)),
                     jnp.bfloat16).astype(jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.3,
                    jnp.bfloat16).astype(jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)

    ref, vjp = jax.vjp(ref_conv, x4, w, b)

    wp = pack_block_weights(w, P=P).astype(jnp.bfloat16)
    out = conv_phase(
        merge(x4).astype(jnp.bfloat16), wp, jnp.tile(b, P)[None, :],
        H=H, W=W, cin=cin, cout=cout, out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(unmerge(out, cout)), np.asarray(ref), atol=2e-2)

    dy = jnp.asarray(rng.standard_normal(ref.shape),
                     jnp.bfloat16).astype(jnp.float32)
    dx_r, dw_r, db_r = vjp(dy)

    # dx: same conv with the spatially-flipped transposed kernel; the
    # phase count must keep P*cout a lane multiple when cout < cin
    cin_t = _pad_cin(cout)
    Pt = max(128 // cin_t, 128 // cin)
    dy_m = merge(dy)
    if cin_t != cout:
        dy_m = merge(jnp.pad(dy, ((0, 0),) * 3 + ((0, cin_t - cout),)))
    wpt = pack_block_weights(
        flip_transpose_kernel(w), P=Pt).astype(jnp.bfloat16)
    dx = conv_phase(
        dy_m.astype(jnp.bfloat16), wpt,
        jnp.zeros((1, Pt * cin), jnp.float32),
        H=H, W=W, cin=cin_t, cout=cin, P=Pt, out_dtype=jnp.float32,
        interpret=True)
    np.testing.assert_allclose(
        np.asarray(unmerge(dx, cin)), np.asarray(dx_r), atol=2e-2)

    # dw: packed accumulation + diagonal unpack
    dwp = conv_phase_dw(
        merge(x4).astype(jnp.bfloat16), dy_m,
        H=H, W=W, cin=cin, cout=cout, interpret=True)
    dw = unpack_dw(dwp, cin, cout)
    scale = float(jnp.max(jnp.abs(dw_r))) + 1e-9
    np.testing.assert_allclose(
        np.asarray(dw) / scale, np.asarray(dw_r) / scale, atol=2e-3)
    # bias grad is just sum(dy) — checked here to pin the convention
    np.testing.assert_allclose(
        np.asarray(jnp.sum(unmerge(merge(dy), cout), axis=(0, 1, 2))),
        np.asarray(db_r), rtol=1e-6)


def test_rgb_encoder_stage_fused_train_integration(monkeypatch):
    """RGBEncoderStage with I2PNET_FUSED_TRAIN=interpret vs the native
    train path: same variable tree, close forward, matching batch_stats
    momentum updates, close parameter gradients."""
    from i2pnet_tpu.nn.layers import RGBEncoderStage

    rng = np.random.default_rng(3)
    B, H, W, cin = 2, 16, 32, 3
    channels, strides = (8, 16), (2, 2)
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, 4, 8, 16)), jnp.float32)

    mod = RGBEncoderStage(channels, strides, dtype=jnp.bfloat16)
    monkeypatch.setenv("I2PNET_FUSED_TRAIN", "0")
    variables = mod.init(jax.random.PRNGKey(0), x, True)
    # non-trivial running stats so the momentum update is visible
    variables = jax.tree_util.tree_map(lambda t: t, variables)

    def run(mode):
        monkeypatch.setenv("I2PNET_FUSED_TRAIN", mode)

        def loss(params):
            out, upd = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) * g), (out, upd)

        (l, (out, upd)), grads = jax.value_and_grad(
            loss, has_aux=True)(variables["params"])
        return l, out, upd, grads

    l_n, out_n, upd_n, gr_n = run("0")
    l_f, out_f, upd_f, gr_f = run("interpret")

    assert float(abs(l_f - l_n)) < 2e-2 * (abs(float(l_n)) + 1.0)
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_n, np.float32),
        atol=3e-2)
    # running-stat updates (momentum rule over identical batch stats)
    for j in range(len(channels)):
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(upd_f["batch_stats"][f"BatchNorm_{j}"][k]),
                np.asarray(upd_n["batch_stats"][f"BatchNorm_{j}"][k]),
                rtol=2e-2, atol=2e-3, err_msg=f"BatchNorm_{j} {k}")
    # parameter gradients: same tree, close values (native rounds pool
    # cotangents to bf16; scale by the leading magnitude per leaf)
    flat_n = jax.tree_util.tree_leaves_with_path(gr_n)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gr_f))
    assert set(flat_f) == {p for p, _ in flat_n}
    for path, tn in flat_n:
        tf = flat_f[path]
        name = jax.tree_util.keystr(path)
        if "Conv" in name and "bias" in name:
            continue  # BN-absorbed; pure cancellation residue both sides
        scale = float(jnp.max(jnp.abs(tn))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(tf) / scale, np.asarray(tn) / scale,
            atol=5e-2, err_msg=name)


def ref_bn_pool(y4f, sc, sh, stride):
    z = y4f * sc + sh
    a = jnp.where(z >= 0, z, 0.1 * z)
    # straight-through bf16 rounding: primal values match the kernel's
    # bf16 cast, but the cotangent stays f32 (a real cast would round the
    # scattered pool cotangent to bf16 mid-chain — the native path's
    # accumulation loss the kernel deliberately avoids)
    a = a + jax.lax.stop_gradient(
        a.astype(jnp.bfloat16).astype(jnp.float32) - a)
    out = jax.lax.reduce_window(
        a, -np.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return out.astype(jnp.bfloat16).astype(jnp.float32)


BN_CASES = [
    (2, 16, 32, 8, 1, False, "pallas"),
    (2, 16, 32, 8, 2, False, "pallas"),
    (2, 16, 32, 8, 1, True, "pallas"),   # heavy ties: routing must match
    (2, 16, 32, 8, 2, True, "pallas"),
    (1, 16, 32, 16, 2, False, "pallas"),
    (1, 16, 64, 32, 2, False, "pallas"),
    # native (max-tree autodiff) backward — used for blocks whose Pallas
    # routing kernel exceeds scoped VMEM; exact vs the first-max ref
    # whenever window maxima are unique
    (2, 16, 32, 8, 1, False, "native"),
    (2, 16, 32, 8, 2, False, "native"),
    (1, 16, 64, 32, 2, False, "native"),
    # production stage-2 tail: cout=128, stride 2 (pallas bwd at this L)
    (1, 8, 16, 128, 2, False, "pallas"),
    # sas (unmerged reduce_window VJP -> select-and-scatter) — the
    # pre-idx wide-block default, kept as a verification backend;
    # first-max ties match the reference
    (2, 16, 32, 8, 1, True, "sas"),
    (2, 16, 32, 8, 2, True, "sas"),
    (1, 16, 64, 32, 2, False, "sas"),
    # idx (forward-saved winner plane, routing-only backward) — same
    # first-max semantics, so bit-exact like "pallas", incl. heavy ties
    (2, 16, 32, 8, 1, False, "idx"),
    (2, 16, 32, 8, 2, False, "idx"),
    (2, 16, 32, 8, 1, True, "idx"),
    (2, 16, 32, 8, 2, True, "idx"),
    (1, 16, 32, 16, 2, False, "idx"),
    (1, 16, 64, 32, 2, False, "idx"),
    (1, 8, 16, 128, 2, False, "idx"),
]


def ref_stage(x4, blocks, strides, eps=1e-5):
    """f32-carried reference stage with straight-through bf16 roundings
    at the same points the fused kernels round primal values."""

    def st16(t):
        return t + jax.lax.stop_gradient(
            t.astype(jnp.bfloat16).astype(jnp.float32) - t)

    x4 = st16(x4.astype(jnp.float32))
    for (w, b, gamma, beta), s in zip(blocks, strides):
        y = st16(ref_conv(x4, w, b))  # kernel emits y in bf16
        axes = (0, 1, 2)
        mean = jnp.mean(y, axes)
        var = jnp.mean(y * y, axes) - mean * mean
        sc = gamma * jax.lax.rsqrt(var + eps)
        z = y * sc + (beta - mean * sc)
        a = jnp.where(z >= 0, z, 0.1 * z)
        a = st16(a)
        x4 = jax.lax.reduce_window(
            a, -np.inf, jax.lax.max, (1, 3, 3, 1), (1, s, s, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))
        x4 = st16(x4)
    return x4


@pytest.mark.parametrize("pool_bwd", [None, "idx"])
def test_fused_stage_train_matches_ref(pool_bwd, monkeypatch):
    from i2pnet_tpu.ops.conv_pallas_train import fused_stage_train

    if pool_bwd is not None:
        monkeypatch.setenv("I2PNET_POOL_BWD", pool_bwd)
    rng = np.random.default_rng(2)
    B, H, W = 2, 16, 32
    cin, channels, strides = 3, (8, 16), (2, 2)

    def bf(x):
        return jnp.asarray(x, jnp.bfloat16).astype(jnp.float32)

    x4 = bf(rng.standard_normal((B, H, W, cin)))
    blocks, c = [], cin
    for ch in channels:
        blocks.append((
            bf(rng.standard_normal((3, 3, c, ch)) * 0.3),
            jnp.asarray(rng.standard_normal((ch,)) * 0.1, jnp.float32),
            jnp.asarray(rng.uniform(0.5, 1.5, (ch,)), jnp.float32),
            jnp.asarray(rng.standard_normal((ch,)) * 0.1, jnp.float32),
        ))
        c = ch

    g = bf(rng.standard_normal((B, H // 4, W // 4, channels[-1])))

    def loss_ref(blocks):
        return jnp.sum(ref_stage(x4, blocks, strides) * g)

    def loss_fused(blocks):
        out, stats = fused_stage_train(
            x4, blocks, H=H, W=W, cin=cin, channels=channels,
            strides=strides, interpret=True)
        return jnp.sum(out.astype(jnp.float32) * g), stats

    lr, gr = jax.value_and_grad(loss_ref)(blocks)
    (lf, stats), gf = jax.value_and_grad(loss_fused, has_aux=True)(blocks)
    assert float(abs(lf - lr)) < 1e-3 * abs(float(lr)) + 1e-3

    # batch stats match the flax formula
    y0 = ref_conv(x4, blocks[0][0], blocks[0][1])
    y0 = y0 + jax.lax.stop_gradient(
        y0.astype(jnp.bfloat16).astype(jnp.float32) - y0)
    np.testing.assert_allclose(
        np.asarray(stats[0][0]), np.asarray(jnp.mean(y0, (0, 1, 2))),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stats[0][1]),
        np.asarray(jnp.mean(y0 * y0, (0, 1, 2))
                   - jnp.mean(y0, (0, 1, 2)) ** 2),
        rtol=1e-4, atol=1e-6)

    for j, (br, bfu) in enumerate(zip(gr, gf)):
        for name, tr, tf in zip(("dw", "db", "dgamma", "dbeta"), br, bfu):
            if name == "db":
                # conv bias cancels through train-mode BN, so db is pure
                # cancellation residue: ~1e-5 in the all-f32 ref, ~1e-2 in
                # any path that rounds the conv cotangent to bf16 (fused
                # AND native). Assert smallness, not equality.
                assert float(jnp.max(jnp.abs(tr))) < 0.1, f"block {j} db ref"
                assert float(jnp.max(jnp.abs(tf))) < 0.1, f"block {j} db"
                continue
            # 1e-2 of the leading gradient magnitude: the fused path rounds
            # inter-block cotangents to bf16 (as the native conv-transpose
            # does); the all-f32 straight-through ref does not.
            scale = float(jnp.max(jnp.abs(tr))) + 1e-6
            np.testing.assert_allclose(
                np.asarray(tf) / scale, np.asarray(tr) / scale,
                atol=1e-2, err_msg=f"block {j} {name}")


@pytest.mark.parametrize("B,H,W,cout,stride,ties,bwd", BN_CASES)
def test_bn_pool_fwd_bwd(B, H, W, cout, stride, ties, bwd):
    rng = np.random.default_rng(1)
    if bwd == "native" and not ties:
        # the native (max-tree) backward splits tie gradients evenly, so
        # exactness vs the first-max ref needs tie-FREE windows: values
        # (h*W + w) mod 19 are pairwise distinct within any 3x3 window
        # (no in-window index difference is divisible by 19 at W=32/64)
        # and spaced above the bf16 ulp at every magnitude reached.
        k = np.arange(H * W).reshape(H, W)
        y4 = np.broadcast_to(
            ((k % 19) * 0.15 - 1.2)[None, :, :, None], (B, H, W, cout)
        ) + np.arange(cout) * 0.003
    elif ties:
        y4 = np.round(rng.standard_normal((B, H, W, cout)) * 2) / 2
    else:
        y4 = rng.standard_normal((B, H, W, cout))
    y4 = jnp.asarray(y4, jnp.bfloat16).astype(jnp.float32)
    sc = jnp.asarray(rng.uniform(0.5, 1.5, (cout,)), jnp.float32)
    sh = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)

    ref, vjp = jax.vjp(
        lambda a, b, c: ref_bn_pool(a, b, c, stride), y4, sc, sh)
    out = bn_pool(merge(y4).astype(jnp.bfloat16), sc, sh,
                  H=H, W=W, cout=cout, stride=stride, interpret=True,
                  bwd=bwd)
    assert float(jnp.max(jnp.abs(
        unmerge(out, cout).astype(jnp.float32) - ref))) == 0.0

    g = jnp.asarray(rng.standard_normal(ref.shape),
                    jnp.bfloat16).astype(jnp.float32)
    dy_r, dsc_r, dsh_r = vjp(g)

    def f(ym, a, b):
        o = bn_pool(ym, a, b, H=H, W=W, cout=cout, stride=stride,
                    interpret=True, bwd=bwd).astype(jnp.float32)
        return jnp.sum(o * merge(g))

    dy_m, dsc, dsh = jax.grad(f, argnums=(0, 1, 2))(
        merge(y4).astype(jnp.bfloat16), sc, sh)
    # the kernel emits dy in bf16 (the conv consumes bf16); round the ref
    dy_rb = dy_r.astype(jnp.bfloat16).astype(jnp.float32)
    dy4 = unmerge(dy_m.astype(jnp.float32), cout)
    if bwd in ("pallas", "idx"):
        # accumulation mirrors select_and_scatter order: bit-exact
        assert float(jnp.max(jnp.abs(dy4 - dy_rb))) == 0.0
    else:
        # max-tree vjp sums the same routed terms in a different f32
        # order; allow 1 bf16 ulp where the sum straddles a boundary
        np.testing.assert_allclose(
            np.asarray(dy4), np.asarray(dy_rb), rtol=2 ** -7, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dsc), np.asarray(dsc_r), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dsh), np.asarray(dsh_r), rtol=1e-4)
