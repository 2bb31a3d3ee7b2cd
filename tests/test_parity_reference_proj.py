"""Numeric parity vs the reference PROJECTION PyTorch model.

Runs the actual /root/reference/src/modellearn_proj_center.py RegNet_v2 on
CPU with a pure-python stub for the fused_conv_select_k CUDA extension
(implementing fused_conv_go.cu's algorithm), converts the state_dict with
convert_proj, and compares forward outputs of both frameworks.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _fused_conv_oracle(xyz1, xyz2, idx_hw, kernel, K, stride, distance, shift, copy):
    """Same algorithm as tests/test_projection.py's oracle (fused_conv_go.cu,
    random_hw = arange)."""
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


def _install_stubs():
    if "fused_conv_select_k_cuda" in sys.modules:
        return
    # torchvision + pointnet2 + cuda no-ops (shared with the free-point test)
    from tests.test_parity_reference import _install_stubs as base_stubs

    base_stubs()

    mod = types.ModuleType("fused_conv_select_k_cuda")

    def fused_conv_select_k(xyz1, xyz2, idx_n2, random_hw, H, W, npoints,
                            kH, kW, K, flag, distance, stride_h, stride_w,
                            sb, sh, sw, valid_idx, valid_in_dis, smask,
                            small_h, small_w):
        shift = bool(flag & 0b0010)
        copy = bool(flag & 0b0001)
        h, w, m = _fused_conv_oracle(
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


class _RefProjTiny:
    """Reference-format cfg matching I2PNetProjConfig.tiny()."""

    use_bn_p = True
    use_bn_input = True
    use_trans = True
    rank = False
    debug = False
    debug_time = False
    debug_dict = None
    rgb_encoder_channels = [
        (3, [8, 8], [2, 2]),
        (8, [8, 16], [2, 2]),
        (16, [16, 32], [1, 2]),
    ]
    stride_Hs = [2, 2, 2, 1]
    stride_Ws = [2, 2, 2, 2]
    init_H = 16
    init_W = 64
    fup = 2.0
    fdown = -24.8
    kernel_sizes = [[3, 5], [3, 5], [3, 3], [3, 3]]
    down_conv_dis = [0.75, 3.0, 6.0, 12.0]
    lidar_feature_size = 7
    using_intens = False
    raw_feat_point = True
    lidar_group_samples = [8, 8, 8, 8, 8]
    lidar_encoder_mlps = [[8, 16], [16, 16], [16, 32], [32, 32], [16, 16]]
    cost_volume_dis = [4.5, 4.5]
    cost_volume_kernel_size = [[3, 3], [3, 3]]
    cost_volume_mlps = [[16, 16], [16, 16]]
    cost_volume_nsamples = [4, [-1, 8]]
    backward_validation = [True, False]
    up_conv_dis = [9.0, 9.0]
    up_conv_kernel_size = [[3, 3], [3, 3]]
    setupconv_mlps = [[[16], [16]], [[16], [16]]]
    setupconv_nsamples = [4, 4]
    flow_predictor_mlps = [[16, 16], [16, 16], [16, 16]]
    pose_head_mlps = [[[], []], [[], []]]
    head_hidden_dim = 32
    rotation_quat_head_dim = 4
    transition_vec_head_dim = 3
    head_dropout_rate = 0.5
    split_dp = False
    max_head = False
    mask_sigmoid = False
    head_pos_embedding = False
    sq_init = -2.5
    sx_init = 0.0
    l1_trans_loss = True
    focal_mask_loss = True
    focal_gamma = 2


@pytest.mark.filterwarnings("ignore")
def test_proj_forward_parity_with_reference():
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    _install_stubs()

    from src.modellearn_proj_center import RegNet_v2

    from i2pnet_tpu.config import I2PNetProjConfig
    from i2pnet_tpu.models import I2PNetProj
    from tools.convert_torch_checkpoint import convert_proj

    cfg_ref = _RefProjTiny
    torch.manual_seed(0)
    ref_model = RegNet_v2(cfg=cfg_ref)
    ref_model.eval()

    rng = np.random.default_rng(0)
    B, N, H, W = 2, 512, 64, 128
    rgb = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    raw = rng.normal(size=(B, N, 3)).astype(np.float32) * 10
    raw[:, 400:] = 0.0
    from scipy.spatial.transform import Rotation

    Rm = Rotation.from_euler("y", 0.2).as_matrix().astype(np.float32)
    lidar = raw @ Rm.T + np.array([1.0, 0, 0.5], np.float32)
    lidar = lidar * (np.sum(raw**2, -1, keepdims=True) > 0)
    intrinsic = np.tile(
        np.array([[[64.0, 0, 64], [0, 64.0, 32], [0, 0, 1]]], np.float32),
        (B, 1, 1),
    )

    with torch.no_grad():
        out = ref_model(
            torch.from_numpy(rgb).permute(0, 3, 1, 2),
            torch.from_numpy(lidar),
            torch.from_numpy(raw),
            None,
            torch.from_numpy(intrinsic),
            None,
            cfg=cfg_ref,
        )
    ref_out3 = out[0].numpy()
    ref_out4 = out[1].numpy()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    variables = convert_proj(sd)
    cfg = I2PNetProjConfig.tiny()
    model = I2PNetProj(cfg)
    got = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(rgb),
        jnp.asarray(lidar),
        jnp.asarray(raw),
        jnp.asarray(intrinsic),
        train=False,
    )
    got_out3 = np.asarray(got["out3"])
    got_out4 = np.asarray(got["out4"])

    np.testing.assert_allclose(got_out4, ref_out4, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(got_out3, ref_out3, atol=5e-4, rtol=1e-3)


@pytest.mark.filterwarnings("ignore")
def test_proj_gradient_parity_with_reference():
    """d(Get_loss)/d(params) parity for the PROJECTION family (the round-2
    gap: gradient parity existed only for free-point). Eval-mode graphs on
    both sides; BatchStatsNorm layers still normalize by CURRENT batch
    statistics (track_running_stats=False), so their stat gradients are
    exercised too. Ref train20v2learn_wandb_proj.py:457-466 loss.backward();
    grads converted with the same layout converter as the weights."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    _install_stubs()

    from compute_loss import Get_loss
    from src.modellearn_proj_center import RegNet_v2

    from i2pnet_tpu.config import I2PNetProjConfig
    from i2pnet_tpu.losses import registration_loss
    from i2pnet_tpu.models import I2PNetProj
    from tools.convert_torch_checkpoint import convert_proj

    cfg_ref = _RefProjTiny
    torch.manual_seed(0)
    ref_model = RegNet_v2(cfg=cfg_ref)
    ref_model.eval()

    rng = np.random.default_rng(0)
    B, N, H, W = 2, 512, 64, 128
    rgb = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    raw = rng.normal(size=(B, N, 3)).astype(np.float32) * 10
    raw[:, 400:] = 0.0
    from scipy.spatial.transform import Rotation

    Rm = Rotation.from_euler("y", 0.2).as_matrix().astype(np.float32)
    lidar = raw @ Rm.T + np.array([1.0, 0, 0.5], np.float32)
    lidar = lidar * (np.sum(raw**2, -1, keepdims=True) > 0)
    intrinsic = np.tile(
        np.array([[[64.0, 0, 64], [0, 64.0, 32], [0, 0, 1]]], np.float32),
        (B, 1, 1),
    )
    q_gt = np.tile(np.array([[0.9988, 0.0, 0.0499, 0.0]], np.float32), (B, 1))
    t_gt = np.tile(np.array([[0.5, -0.2, 0.1]], np.float32), (B, 1))

    out = ref_model(
        torch.from_numpy(rgb).permute(0, 3, 1, 2),
        torch.from_numpy(lidar),
        torch.from_numpy(raw),
        None,
        torch.from_numpy(intrinsic),
        None,
        cfg=cfg_ref,
    )
    ref_loss, _, _ = Get_loss(
        out[0], out[1], torch.from_numpy(q_gt), torch.from_numpy(t_gt),
        out[4], out[5], cfg_ref,
    )
    ref_model.zero_grad()
    ref_loss.backward()

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    named_params = dict(ref_model.named_parameters())
    grad_sd = {
        k: (named_params[k].grad.numpy()
            if k in named_params and named_params[k].grad is not None
            else np.zeros_like(v))
        for k, v in sd.items()
    }
    want_grads = convert_proj(grad_sd)["params"]

    variables = convert_proj(sd)
    cfg = I2PNetProjConfig.tiny()
    model = I2PNetProj(cfg)

    def loss_fn(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(rgb), jnp.asarray(lidar), jnp.asarray(raw),
            jnp.asarray(intrinsic), train=False,
        )
        loss, _, _ = registration_loss(
            o["out3"], o["out4"], jnp.asarray(q_gt), jnp.asarray(t_gt),
            o["sx"], o["sq"], l1_trans=True,
        )
        return loss

    loss, got_grads = jax.value_and_grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)

    flat_got = jax.tree_util.tree_leaves_with_path(got_grads)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, want_grads)))
    assert flat_want.keys() == dict(flat_got).keys()
    worst = (0.0, None)
    for path, g in flat_got:
        w = np.asarray(flat_want[path])
        g = np.asarray(g)
        # scale floor 1e-2 (vs 1e-3 in the free-point test): the proj
        # graph's longer reduction chains leave ~1e-5 absolute roundoff on
        # near-zero leaves (e.g. layer_idx biases with |g|max < 1e-3),
        # which is noise, not layout error — bound those by absolute 5e-5
        scale = max(np.abs(w).max(), 1e-2)
        rel = np.abs(g - w).max() / scale
        if rel > worst[0]:
            worst = (rel, jax.tree_util.keystr(path))
        assert rel < 5e-3, (jax.tree_util.keystr(path), rel, scale)
    print(f"proj gradient parity: worst rel diff {worst[0]:.2e} at {worst[1]}")
