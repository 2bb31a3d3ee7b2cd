"""Evaluation harness (ref /root/reference/evaluation_proj.py Evaluator,
evaluation.py, evaluation_cmr.py).

Per-batch synchronized timing (mean_FPS / mean_time), RTE/RRE + per-axis
calibration errors on the decalib matrices, section-framed prediction.txt
rows (init/pred/gt extrinsics, 9 decimals — re-parseable by
analysis.parse_prediction_file), metrics npz for offline recall analysis,
and the small-range cascade protocol (re-warp the cloud by each stage's
prediction and compose quaternions, ref evaluation_cmr.py:330-377).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from i2pnet_tpu import metrics as M
from i2pnet_tpu.data.pipeline import BatchLoader, to_model_batch
from i2pnet_tpu.ops import quaternion as Q

SECTION = "§"  # section-sign framing (ref evaluation_proj.py:145-167)


class Evaluator:
    def __init__(
        self,
        model,
        cfg,
        params_list: Sequence,  # one params pytree per cascade stage
        batch_stats_list: Optional[Sequence] = None,
        proj: bool = False,
        log_dir: str = "info_test",
        tag: str = "",
        writer=None,
        vis_rate: int = 0,
        mesh=None,
    ):
        self.model = model
        self.cfg = cfg
        self.params_list = list(params_list)
        self.batch_stats_list = (
            list(batch_stats_list)
            if batch_stats_list is not None
            else [{}] * len(self.params_list)
        )
        self.proj = proj
        self.log_dir = log_dir
        self.tag = tag
        # multi-device batch fan-out (SURVEY §5.8 eval fan-out): a pure-DP
        # jax.sharding.Mesh shards every batch along axis 0 with params
        # replicated; calls run under jax.set_mesh so the fused-eval /
        # dense-eval Pallas guards (nn/layers.py _fused_mode,
        # proj_backbone.proj_dense_eval_mode) ride the ambient dp axis via
        # shard_map instead of falling back. Eval is per-example, so a
        # ragged final batch is padded to the device count and trimmed.
        self.mesh = mesh
        # projection-image fan-out (ref evaluation.py:630-657 logs
        # init/pred/gt overlays + an NHWC comparison batch to the writer);
        # vis_rate=N logs sample 0 of every Nth batch, 0 disables
        self.writer = writer
        self.vis_rate = int(vis_rate)
        self._vis_step = 0
        os.makedirs(log_dir, exist_ok=True)

        def forward(params, batch_stats, rgb, lidar, raw_xyz, intrinsic,
                    feats, calib=None):
            variables = {"params": params, "batch_stats": batch_stats}
            if proj:
                out = self.model.apply(
                    variables, rgb, lidar, raw_xyz, intrinsic,
                    lidar_feature=feats, train=False,
                )
            else:
                # calib: efgh online-calibration projection matrix
                # (ref evaluation.py:354-356 threads data['calib'])
                out = self.model.apply(
                    variables, rgb, lidar, intrinsic,
                    lidar_feature=feats, raw_xyz=raw_xyz, calib=calib,
                    train=False,
                )
            return out["out3"], out["out4"]

        def rewarp(lidar, out3):
            # cascade re-warp: compose prediction into the cloud for the
            # next stage (ref evaluation_cmr.py:330-346)
            return Q.warp_points(lidar, out3[:, :4], out3[:, 4:])

        if mesh is None:
            self._forward = jax.jit(forward)
            self._rewarp = jax.jit(rewarp)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P(mesh.axis_names[0]))
            jfwd = jax.jit(
                forward,
                in_shardings=(repl, repl, data, data, data, data, data, data),
                out_shardings=data,
            )
            jrw = jax.jit(rewarp, in_shardings=(data, data),
                          out_shardings=data)

            def fwd_call(*args):
                with jax.set_mesh(mesh):
                    return jfwd(*args)

            def rw_call(*args):
                with jax.set_mesh(mesh):
                    return jrw(*args)

            self._forward = fwd_call
            self._rewarp = rw_call

    def _log_projection_images(self, rgb, lidar, intrinsic, out3_np,
                               q_gt, t_gt) -> None:
        """Writer fan-out of init/pred/gt projection overlays for sample 0
        (ref evaluation.py:630-657: three add_image calls + one NHWC
        add_images comparison batch, same tags)."""
        from i2pnet_tpu.eval.visualize import render_projection

        def decalib_E(q, t):
            R = M.quat_to_rotmat_batch(np.asarray(q)[None])[0]
            return np.concatenate(
                [R, np.asarray(t).reshape(3, 1)], axis=1).astype(np.float32)

        rgb_u8 = np.clip(rgb[0], 0, 255).astype(np.uint8)
        pts = lidar[0]
        intr = intrinsic[0]
        # the model input cloud already sits in the decalibrated frame, so
        # "init" projects through identity and pred/gt through the
        # corrections (same frame convention as tools/render_demo.py)
        panels = {
            "init_projected_img": render_projection(
                rgb_u8, pts, np.eye(3, 4, dtype=np.float32), intr),
            "pj_projected_img": render_projection(
                rgb_u8, pts, decalib_E(out3_np[0, :4], out3_np[0, 4:]), intr),
            "gt_projected_img": render_projection(
                rgb_u8, pts, decalib_E(q_gt[0], t_gt[0]), intr),
        }
        for tag, img in panels.items():
            self.writer.add_image(tag, img, self._vis_step)
        self.writer.add_images(
            "comparison_img", np.stack(list(panels.values())), self._vis_step)
        self._vis_step += 1

    def validate(self, loader: BatchLoader, save_metrics: bool = True) -> Dict:
        ev = M.RteRreEval()
        axis_errs: List = []
        batch_times: List[float] = []
        pred_lines: List[str] = []
        msee_all: List[np.ndarray] = []

        for bi, batch in enumerate(loader):
            mb = to_model_batch(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            rgb = jnp.asarray(mb["rgb"])
            lidar = jnp.asarray(mb["lidar"])
            raw_xyz = jnp.asarray(mb.get("raw_xyz", mb["lidar"]))
            intrinsic = jnp.asarray(mb["intrinsic"])
            feats = jnp.asarray(mb["lidar_feats"]) if "lidar_feats" in mb else None
            calib = jnp.asarray(mb["calib"]) if "calib" in mb else None

            # DP fan-out: pad a ragged final batch up to the device count
            # (eval is per-example — BN uses fixed stats — so repeated pad
            # rows change nothing; their outputs are trimmed below)
            n_orig = int(rgb.shape[0])
            if self.mesh is not None:
                n_dev = int(self.mesh.devices.size)
                rem = n_orig % n_dev
                if rem:
                    k = n_dev - rem

                    def _pad(a):
                        if a is None:
                            return None
                        return jnp.concatenate(
                            [a, jnp.repeat(a[-1:], k, axis=0)], axis=0)

                    rgb, lidar, raw_xyz, intrinsic, feats, calib = (
                        _pad(rgb), _pad(lidar), _pad(raw_xyz),
                        _pad(intrinsic), _pad(feats), _pad(calib))

            t0 = time.perf_counter()
            out3 = None
            q_acc = t_acc = None
            cur_lidar = lidar
            for params, bstats in zip(self.params_list, self.batch_stats_list):
                out3_s, out4_s = self._forward(
                    params, bstats, rgb, cur_lidar, raw_xyz, intrinsic,
                    feats, calib
                )
                if q_acc is None:
                    q_acc, t_acc = out3_s[:, :4], out3_s[:, 4:]
                else:
                    q_acc, t_acc = Q.compose_pose(
                        out3_s[:, :4], out3_s[:, 4:], q_acc, t_acc
                    )
                if len(self.params_list) > 1:
                    cur_lidar = self._rewarp(lidar, jnp.concatenate([q_acc, t_acc], 1))
            out3 = jnp.concatenate([q_acc, t_acc], axis=1)
            out3_np = np.asarray(jax.block_until_ready(out3))[:n_orig]
            batch_times.append((time.perf_counter() - t0, out3_np.shape[0]))

            q_gt = np.asarray(batch["decalib_real_gt"])
            t_gt = np.asarray(batch["decalib_dual_gt"])
            init_E = np.asarray(batch["init_extrinsic"])
            pred_E, gt_E, pred_raw, gt_raw = M.get_extrinsic(
                out3_np, q_gt, t_gt, init_E, out_raw=True
            )
            ev.add_batch(pred_E, gt_E)
            axis_errs.append(M.calibration_error_batch(pred_E, gt_E))
            gt_se3 = M.extrinsic_to_se3(gt_raw)
            msee_all.append(M.eval_msee(out3_np, gt_se3, pred_E=pred_raw))

            if self.writer is not None and self.vis_rate and bi % self.vis_rate == 0:
                self._log_projection_images(
                    np.asarray(mb["rgb"]), np.asarray(mb["lidar"]),
                    np.asarray(mb["intrinsic"]), out3_np, q_gt, t_gt,
                )

            for b in range(out3_np.shape[0]):
                path_info = (
                    batch["path_info"][b] if "path_info" in batch else str(b)
                )
                rows = [f"{SECTION} {path_info}"]
                for name, mat in (
                    ("init", init_E[b]),
                    ("pred", pred_E[b]),
                    ("gt", gt_E[b]),
                ):
                    vals = " ".join("%.9f" % v for v in np.asarray(mat).reshape(-1))
                    rows.append(f"{name} {vals}")
                pred_lines.append("\n".join(rows))

        rte_mean, rte_std, rre_mean, rre_std = ev.eval_seq()
        axis = np.concatenate([np.stack(a, -1) for a in axis_errs], 0).mean(0)
        # timing protocol: only FULL batches count, minus the first of them
        # (it absorbs the jit compiles; cascade stages share one jitted
        # forward — params are arguments with identical pytree structure —
        # so stage 2+ hit the stage-1 executable). A ragged final batch
        # (drop_last=False) has a different shape and triggers its own
        # compile, so it is excluded rather than skewing mean_time. Host
        # preprocessing stays outside the timed region (chip throughput,
        # like the reference's synchronized window,
        # ref evaluation_proj.py:239-264).
        bsz = loader.batch_size
        full = [t for t, n in batch_times if n == bsz]
        timed = full[1:]
        timing_includes_compile = False
        if timed:
            mean_time = float(np.mean(timed))
            mean_fps = bsz / mean_time if mean_time > 0 else float("nan")
        else:
            # zero or one full batch: there is no compile-free full-batch
            # sample, so report aggregate throughput and flag that the jit
            # compile is inside the window (a single full batch would
            # otherwise report its compile as steady-state time)
            timing_includes_compile = True
            tot_t = sum(t for t, _ in batch_times)
            tot_n = sum(n for _, n in batch_times)
            mean_time = tot_t / max(len(batch_times), 1)
            mean_fps = tot_n / tot_t if tot_t > 0 else float("nan")
        summary = {
            "rte_mean": rte_mean,
            "rte_std": rte_std,
            "rre_mean": rre_mean,
            "rre_std": rre_std,
            "roll_deg": axis[0],
            "pitch_deg": axis[1],
            "yaw_deg": axis[2],
            "x_m": axis[3],
            "y_m": axis[4],
            "z_m": axis[5],
            "msee": float(np.concatenate(msee_all).mean()),
            "mean_time_s": mean_time,
            "mean_fps": mean_fps,
            "timing_includes_compile": timing_includes_compile,
            "count": ev.all_count,
        }

        ts = time.strftime("%Y%m%d_%H%M%S")
        with open(
            os.path.join(self.log_dir, f"log_test{self.tag}.txt"), "a"
        ) as f:
            f.write(
                " ".join(f"{k}={v}" for k, v in summary.items()) + "\n"
            )
        with open(
            os.path.join(self.log_dir, f"prediction{self.tag}.txt"), "w"
        ) as f:
            f.write("\n".join(pred_lines) + "\n")
        if save_metrics:
            ev.save_metric(os.path.join(self.log_dir, f"metrics_{ts}.npz"))
        return summary
