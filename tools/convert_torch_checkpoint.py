#!/usr/bin/env python
"""Convert a reference PyTorch I2PNet checkpoint to flax variables.

Maps the reference RegNet_v2 state_dict (free-point,
/root/reference/src/modellearn.py) onto this repo's I2PNet parameter tree,
so pretrained reference checkpoints can be evaluated and numerically
compared on TPU.

Layout rules:
  torch Conv2d 3x3 (out,in,kh,kw)   -> flax Conv kernel (kh,kw,in,out)
  torch Conv2d 1x1 / Conv1d k=1     -> flax Dense kernel (in,out)
  torch BatchNorm weight/bias        -> BatchNorm scale/bias (params)
  torch BatchNorm running_mean/var   -> batch_stats mean/var
  (proj path's track_running_stats=False BN -> BatchStatsNorm scale/bias)

Usage:
  python tools/convert_torch_checkpoint.py ckpt.pt out_dir [--proj]
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np


def _conv3x3(w):  # (out,in,kh,kw) -> (kh,kw,in,out)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w):  # (out,in,1[,1]) or (out,in) -> (in,out)
    w = np.asarray(w)
    w = w.reshape(w.shape[0], w.shape[1])
    return w.T


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def convert_free_point(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference free-point RegNet_v2 state_dict -> {'params', 'batch_stats'}."""
    params: dict = {}
    stats: dict = {}

    def bn(dst_scope, prefix):
        _set(params, dst_scope + ("scale",), state_dict[prefix + ".weight"])
        _set(params, dst_scope + ("bias",), state_dict[prefix + ".bias"])
        _set(stats, dst_scope + ("mean",), state_dict[prefix + ".running_mean"])
        _set(stats, dst_scope + ("var",), state_dict[prefix + ".running_var"])

    # --- RGB encoder: RGB_net{1..3}.{i*4}=conv, {i*4+1}=bn
    for stage in range(3):
        src = f"RGB_net{stage + 1}"
        dst = ("rgb_encoder", f"RGBEncoderStage_{stage}")
        i = 0
        while f"{src}.{i * 4}.weight" in state_dict:
            _set(params, dst + (f"Conv_{i}", "kernel"),
                 _conv3x3(state_dict[f"{src}.{i * 4}.weight"]))
            _set(params, dst + (f"Conv_{i}", "bias"),
                 state_dict[f"{src}.{i * 4}.bias"])
            bn(dst + (f"BatchNorm_{i}",), f"{src}.{i * 4 + 1}")
            i += 1

    # --- PointNet SA layers: LiDAR_lv{1..4}, layer_idx
    sa_map = {f"LiDAR_lv{k}": f"lidar_lv{k}" for k in range(1, 5)}
    sa_map["layer_idx"] = "layer_idx"
    for src, dst_name in sa_map.items():
        i = 0
        while f"{src}.mlp_convs.{i}.weight" in state_dict:
            _set(params, (dst_name, f"Dense_{i}", "kernel"),
                 _dense(state_dict[f"{src}.mlp_convs.{i}.weight"]))
            _set(params, (dst_name, f"Dense_{i}", "bias"),
                 state_dict[f"{src}.mlp_convs.{i}.bias"])
            bn((dst_name, f"BatchNorm_{i}"), f"{src}.mlp_bns.{i}")
            i += 1

    # --- pointwise-conv stacks (Conv2d 1x1 with optional BN)
    def pw_stack(src_prefix, dst_scope):
        i = 0
        while f"{src_prefix}.{i}.conv.weight" in state_dict:
            scope = dst_scope + (f"PointwiseConv_{i}",)
            _set(params, scope + ("Dense_0", "kernel"),
                 _dense(state_dict[f"{src_prefix}.{i}.conv.weight"]))
            _set(params, scope + ("Dense_0", "bias"),
                 state_dict[f"{src_prefix}.{i}.conv.bias"])
            if f"{src_prefix}.{i}.bn_linear.weight" in state_dict:
                bn(scope + ("BatchNorm_0",), f"{src_prefix}.{i}.bn_linear")
            i += 1

    def pw_single(src_prefix, dst_scope):
        _set(params, dst_scope + ("Dense_0", "kernel"),
             _dense(state_dict[f"{src_prefix}.conv.weight"]))
        _set(params, dst_scope + ("Dense_0", "bias"),
             state_dict[f"{src_prefix}.conv.bias"])
        if f"{src_prefix}.bn_linear.weight" in state_dict:
            bn(dst_scope + ("BatchNorm_0",), f"{src_prefix}.bn_linear")

    for cv in ("cost_volume1", "cost_volume2"):
        pw_stack(f"{cv}.mlp1_convs", (cv, "mlp1_convs"))
        pw_stack(f"{cv}.mlp2_convs", (cv, "mlp2_convs"))
        pw_stack(f"{cv}.mlp2_convs_2", (cv, "mlp2_convs_2"))
        pw_single(f"{cv}.pi_encoding", (cv, "pi_encoding"))
        pw_single(f"{cv}.pc_encoding", (cv, "pc_encoding"))

    for fp in ("flow_predictor0", "flow_predictor0_predict", "flow_predictor0_w"):
        pw_stack(f"{fp}.mlp_conv", (fp, "mlp_conv"))

    for up in ("set_upconv0_w_upsample", "set_upconv0_upsample"):
        pw_stack(f"{up}.mlp_conv", (up, "mlp_conv"))
        pw_stack(f"{up}.mlp2_conv", (up, "mlp2_conv"))

    # --- pose heads: Conv1d(k=1) sequential index 0 = conv
    for head in ("l4_head", "l3_head"):
        for sub in ("hidden_layer", "quat_head", "trans_head"):
            key = f"{head}.{sub}.composed_module.0"
            _set(params, (head, sub, "kernel"), _dense(state_dict[key + ".weight"]))
            _set(params, (head, sub, "bias"), state_dict[key + ".bias"])

    # --- learned loss weights
    _set(params, ("sq",), state_dict["sq"])
    _set(params, ("sx",), state_dict["sx"])

    return {"params": params, "batch_stats": stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("--proj", action="store_true",
                    help="checkpoint is a projection-path model")
    args = ap.parse_args()
    import torch

    raw = torch.load(args.ckpt, map_location="cpu")
    sd = raw.get("model_state_dict", raw)
    # strip only a LEADING DataParallel prefix — a blanket replace would
    # mangle interior names like 'composed_module.0' (ref
    # src/util/pytorch_helper.py strips the prefix the same way)
    def _strip(k):
        return k[len("module."):] if k.startswith("module.") else k

    sd = {_strip(k): v.numpy() for k, v in sd.items()}
    variables = convert_proj(sd) if args.proj else convert_free_point(sd)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(args.out_dir, variables)
    ckptr.wait_until_finished()
    print(f"saved flax variables to {args.out_dir}")


if __name__ == "__main__":
    main()


def convert_proj(state_dict: Dict[str, np.ndarray]) -> dict:
    """Reference projection RegNet_v2 (modellearn_proj_center) state_dict ->
    {'params', 'batch_stats'}.

    The projection path's BN has track_running_stats=False (no running
    buffers in the state_dict) and maps onto BatchStatsNorm scale/bias;
    only the RGB encoder carries batch_stats.
    """
    params: dict = {}
    stats: dict = {}

    def bn_running(dst_scope, prefix):
        _set(params, dst_scope + ("scale",), state_dict[prefix + ".weight"])
        _set(params, dst_scope + ("bias",), state_dict[prefix + ".bias"])
        _set(stats, dst_scope + ("mean",), state_dict[prefix + ".running_mean"])
        _set(stats, dst_scope + ("var",), state_dict[prefix + ".running_var"])

    def bn_stateless(dst_scope, prefix):
        _set(params, dst_scope + ("scale",), state_dict[prefix + ".weight"])
        _set(params, dst_scope + ("bias",), state_dict[prefix + ".bias"])

    # RGB encoder identical to the free-point mapping
    for stage in range(3):
        src = f"RGB_net{stage + 1}"
        dst = ("rgb_encoder", f"RGBEncoderStage_{stage}")
        i = 0
        while f"{src}.{i * 4}.weight" in state_dict:
            _set(params, dst + (f"Conv_{i}", "kernel"),
                 _conv3x3(state_dict[f"{src}.{i * 4}.weight"]))
            _set(params, dst + (f"Conv_{i}", "bias"),
                 state_dict[f"{src}.{i * 4}.bias"])
            bn_running(dst + (f"BatchNorm_{i}",), f"{src}.{i * 4 + 1}")
            i += 1

    def pw_stack(src_prefix, dst_scope):
        i = 0
        while f"{src_prefix}.{i}.conv.weight" in state_dict:
            scope = dst_scope + (f"PointwiseConv_{i}",)
            _set(params, scope + ("Dense_0", "kernel"),
                 _dense(state_dict[f"{src_prefix}.{i}.conv.weight"]))
            _set(params, scope + ("Dense_0", "bias"),
                 state_dict[f"{src_prefix}.{i}.conv.bias"])
            if f"{src_prefix}.{i}.bn_linear.weight" in state_dict:
                bn_stateless(scope + ("BatchStatsNorm_0",),
                             f"{src_prefix}.{i}.bn_linear")
            i += 1

    def pw_single(src_prefix, dst_scope):
        _set(params, dst_scope + ("Dense_0", "kernel"),
             _dense(state_dict[f"{src_prefix}.conv.weight"]))
        _set(params, dst_scope + ("Dense_0", "bias"),
             state_dict[f"{src_prefix}.conv.bias"])
        if f"{src_prefix}.bn_linear.weight" in state_dict:
            bn_stateless(dst_scope + ("BatchStatsNorm_0",),
                         f"{src_prefix}.bn_linear")

    for src, dst_name in {
        "LiDAR_lv1": "lidar_lv1", "LiDAR_lv2": "lidar_lv2",
        "LiDAR_lv3": "lidar_lv3", "LiDAR_lv4": "lidar_lv4",
        "layer_idx": "layer_idx",
    }.items():
        pw_stack(f"{src}.mlp_convs", (dst_name, "mlp_convs"))

    for cv in ("cost_volume1", "cost_volume2"):
        pw_stack(f"{cv}.mlp1_convs", (cv, "mlp1_convs"))
        pw_stack(f"{cv}.mlp2_convs", (cv, "mlp2_convs"))
        pw_stack(f"{cv}.mlp2_convs_2", (cv, "mlp2_convs_2"))
        pw_single(f"{cv}.pi_encoding", (cv, "pi_encoding"))
        pw_single(f"{cv}.pc_encoding", (cv, "pc_encoding"))

    for fp in ("flow_predictor0", "flow_predictor0_predict", "flow_predictor0_w"):
        pw_stack(f"{fp}.mlp_conv", (fp, "mlp_conv"))

    for up in ("set_upconv0_w_upsample", "set_upconv0_upsample"):
        pw_stack(f"{up}.mlp_conv", (up, "mlp_conv"))
        pw_stack(f"{up}.mlp2_conv", (up, "mlp2_conv"))

    for head in ("l4_head", "l3_head"):
        for sub in ("hidden_layer", "quat_head", "trans_head"):
            key = f"{head}.{sub}.composed_module.0"
            _set(params, (head, sub, "kernel"), _dense(state_dict[key + ".weight"]))
            _set(params, (head, sub, "bias"), state_dict[key + ".bias"])

    _set(params, ("sq",), state_dict["sq"])
    _set(params, ("sx",), state_dict["sx"])
    return {"params": params, "batch_stats": stats}
