"""Training harness (ref /root/reference/train20v2learn_wandb.py Trainer and
train20v2learn_wandb_proj.py).

One object drives: DP-sharded jitted train step, per-epoch orbax
checkpoints + resume, validation with RTE/RRE + per-axis calibration
errors, best-model tracking (rotation / translation), UniWriter logging,
and a resolved-config dump for reproducibility (the reference snapshots
its source files, ref :139-148; here the dump contains the full dataclass
config + run flags).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from i2pnet_tpu import metrics as M
from i2pnet_tpu.data.pipeline import BatchLoader, to_model_batch
from i2pnet_tpu.parallel import make_mesh, batch_spec, replicate_spec, shard_train_step
from i2pnet_tpu.train.checkpoint import CheckpointManager
from i2pnet_tpu.train.state import create_train_state
from i2pnet_tpu.train.step import (
    make_accum_train_step,
    make_eval_step,
    make_eval_step_proj,
    make_train_step,
    make_train_step_proj,
)
from i2pnet_tpu.utils.monitor import UniWriter


class Trainer:
    def __init__(
        self,
        model,
        cfg,
        train_dataset,
        valid_dataset=None,
        log_dir: str = "log",
        batch_size: int = 8,
        lr: float = 1e-3,
        weight_decay: float = 1e-4,
        clip: float = -1.0,
        epochs: int = 200,
        seed: int = 0,
        proj: bool = False,
        save_rate: int = 20,
        resume: bool = False,
        accum_steps: int = 1,
        run_flags: Optional[dict] = None,
    ):
        self.model = model
        self.cfg = cfg
        self.proj = proj
        self.epochs = epochs
        self.batch_size = batch_size
        self.save_rate = save_rate
        self.seed = seed
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)

        self.writer = UniWriter(log_dir)
        resolved = {
            "config": dataclasses.asdict(cfg),
            "flags": run_flags or {},
            "batch_size": batch_size,
            "lr": lr,
            "weight_decay": weight_decay,
            "clip": clip,
            "epochs": epochs,
            "seed": seed,
            "proj": proj,
            "accum_steps": accum_steps,
        }
        self._check_config_consistency(resolved, resume)
        self.writer.config(resolved)
        self._snapshot_sources(resume)

        self.train_loader = BatchLoader(
            train_dataset, batch_size, shuffle=True, seed=seed, device_only=True
        )
        self.valid_loader = (
            BatchLoader(
                valid_dataset, batch_size, shuffle=False, seed=seed, drop_last=False
            )
            if valid_dataset is not None
            else None
        )
        steps_per_epoch = max(len(self.train_loader), 1)

        # build state from one sample batch (assembled directly — iterating
        # the loader here would abandon its prefetch thread mid-queue and
        # consume dataset rng draws concurrently with the first epoch)
        from i2pnet_tpu.data.pipeline import collate

        samples = [train_dataset[i % len(train_dataset)] for i in range(batch_size)]
        sample = to_model_batch(collate(samples, device_only=True))
        sample = {k: jnp.asarray(v) for k, v in sample.items()}
        init_args = self._model_args(sample)
        init_kw = {"lidar_feature": sample.get("lidar_feats")}
        if not proj:
            init_kw["raw_xyz"] = sample.get("raw_xyz")
        variables = self.model.init(
            jax.random.key(seed), *init_args, train=False, **init_kw
        )
        self.state = create_train_state(
            self.model,
            variables,
            lr=lr,
            weight_decay=weight_decay,
            steps_per_epoch=steps_per_epoch,
            clip=clip,
        )

        # DP over the largest device count that divides the batch
        n_dev = len(jax.devices())
        while batch_size % n_dev:
            n_dev -= 1
        self.mesh = make_mesh(jax.devices()[:n_dev])
        if accum_steps > 1:
            if batch_size % accum_steps:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by accum_steps {accum_steps}"
                )
            step_fn = make_accum_train_step(self.model, cfg, accum_steps, proj=proj)
        else:
            step_fn = (
                make_train_step_proj(self.model, cfg)
                if proj
                else make_train_step(self.model, cfg)
            )
        self._train_step = shard_train_step(step_fn, self.mesh)
        eval_fn = (
            make_eval_step_proj(self.model, cfg)
            if proj
            else make_eval_step(self.model, cfg)
        )
        self._eval_step = jax.jit(eval_fn)
        self.state = jax.device_put(self.state, replicate_spec(self.mesh))
        self._data_sharding = batch_spec(self.mesh)

        self.ckpt = CheckpointManager(log_dir)
        self.start_epoch = 0
        self.n_iter = 0
        self.best = {"rotation": np.inf, "translation": np.inf, "msee": np.inf}
        if resume and self.ckpt.latest_step() is not None:
            self.state, meta = self.ckpt.restore(self.state)
            self.state = jax.device_put(self.state, replicate_spec(self.mesh))
            if meta:
                self.start_epoch = int(meta.get("epoch", 0)) + 1
                self.n_iter = int(meta.get("n_iter", 0))
                self.best = {**self.best, **meta.get("best", {})}
            print(f"[trainer] resumed at epoch {self.start_epoch}")

    def _snapshot_sources(self, resume: bool) -> None:
        """Archive the package sources into the log dir so a run is
        reproducible even if the tree moves on (ref
        train20v2learn_wandb.py:139-148 copies its source files)."""
        path = os.path.join(self.log_dir, "src_snapshot.tar.gz")
        if resume and os.path.exists(path):
            return
        import tarfile

        import i2pnet_tpu

        pkg_dir = os.path.dirname(os.path.abspath(i2pnet_tpu.__file__))
        try:
            with tarfile.open(path, "w:gz") as tar:
                tar.add(
                    pkg_dir,
                    arcname="i2pnet_tpu",
                    filter=lambda ti: ti
                    if ti.name.endswith((".py", "i2pnet_tpu")) or ti.isdir()
                    else None,
                )
        except OSError:
            pass  # snapshot is best-effort; never block training

    def _check_config_consistency(self, resolved: dict, resume: bool) -> None:
        """A resumed run must match its original config
        (ref train20v2learn_wandb.py:127-137)."""
        path = os.path.join(self.log_dir, "config.json")
        if resume and os.path.exists(path):
            with open(path) as f:
                old = json.load(f)
            for key in ("config", "batch_size", "proj"):
                if json.dumps(old.get(key), sort_keys=True, default=str) != json.dumps(
                    resolved.get(key), sort_keys=True, default=str
                ):
                    raise ValueError(
                        f"resume config mismatch on '{key}' — refusing to resume"
                    )

    def _model_args(self, mb: Dict[str, jnp.ndarray]):
        if self.proj:
            return (mb["rgb"], mb["lidar"], mb["raw_xyz"], mb["intrinsic"])
        return (mb["rgb"], mb["lidar"], mb["intrinsic"])

    def train(self) -> None:
        rng = jax.random.key(self.seed + 1)
        for epoch in range(self.start_epoch, self.epochs):
            t0 = time.time()
            losses = []
            for bi, batch in enumerate(self.train_loader):
                mb = to_model_batch(batch)
                mb = {
                    k: jax.device_put(np.asarray(v), self._data_sharding)
                    for k, v in mb.items()
                }
                rng, step_rng = jax.random.split(rng)
                self.state, m = self._train_step(self.state, mb, step_rng)
                self.n_iter += 1
                if bi % self.save_rate == 0:
                    loss = float(m["loss"])
                    losses.append(loss)
                    self.writer.add_scalar("train/loss", loss, self.n_iter)
                    self.writer.add_scalar("train/loss_q", float(m["loss_q"]), self.n_iter)
                    self.writer.add_scalar("train/loss_x", float(m["loss_x"]), self.n_iter)
                    self.writer.text_log(
                        "log.txt",
                        f"epoch {epoch} iter {self.n_iter} loss {loss:.6f}",
                    )
            dt = time.time() - t0
            mean_loss = float(np.mean(losses)) if losses else float("nan")
            self.writer.add_scalar("train/epoch_time_s", dt, epoch)
            print(f"[trainer] epoch {epoch}: mean loss {mean_loss:.4f} ({dt:.1f}s)")

            if self.valid_loader is not None:
                val = self.validate()
                for k, v in val.items():
                    self.writer.add_scalar(f"val/{k}", v, epoch)
                self.writer.text_log(
                    "log_rotate.txt", f"epoch {epoch} rre {val['rre_mean']:.6f}"
                )
                self.writer.text_log(
                    "log_trans.txt", f"epoch {epoch} rte {val['rte_mean']:.6f}"
                )
                snapshot = {
                    "params": self.state.params,
                    "batch_stats": self.state.batch_stats,
                }
                if val["rre_mean"] < self.best["rotation"]:
                    self.best["rotation"] = val["rre_mean"]
                    self.ckpt.save_best("model_rotation_best", snapshot)
                if val["rte_mean"] < self.best["translation"]:
                    self.best["translation"] = val["rte_mean"]
                    self.ckpt.save_best("model_transition_best", snapshot)
                if val["msee"] < self.best["msee"]:
                    self.best["msee"] = val["msee"]
                    self.ckpt.save_best("model_msee_best", snapshot)

            self.ckpt.save(
                epoch,
                self.state,
                meta={"epoch": epoch, "n_iter": self.n_iter, "best": self.best},
            )
        self.ckpt.wait()

    def validate(self) -> Dict[str, float]:
        ev = M.RteRreEval()
        axis_errs = []
        msees = []
        for batch in self.valid_loader:
            mb = to_model_batch(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            mb_dev = {k: jnp.asarray(v) for k, v in mb.items()}
            out = self._eval_step(self.state, mb_dev)
            out3 = np.asarray(out["out3"])
            pred_E, gt_E = M.get_extrinsic(
                out3,
                np.asarray(batch["decalib_real_gt"]),
                np.asarray(batch["decalib_dual_gt"]),
                np.asarray(batch["init_extrinsic"]),
            )
            ev.add_batch(pred_E, gt_E)
            axis_errs.append(M.calibration_error_batch(pred_E, gt_E))
            gt_q = np.asarray(batch["decalib_real_gt"])
            gt_t = np.asarray(batch["decalib_dual_gt"])
            gt_E_raw = np.concatenate(
                [M.quat_to_rotmat_batch(gt_q), gt_t.reshape(-1, 3, 1)], -1
            )
            msees.append(M.eval_msee(out3, M.extrinsic_to_se3(gt_E_raw)))
        rte_mean, rte_std, rre_mean, rre_std = ev.eval_seq()
        axis = np.concatenate([np.stack(a, -1) for a in axis_errs], 0).mean(0)
        return {
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
            "msee": float(np.concatenate(msees).mean()),
        }
