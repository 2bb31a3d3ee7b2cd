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
        train_target: str = "all",
        extra_valid_datasets: Optional[Dict[str, Any]] = None,
        num_workers: int = 0,
    ):
        """train_target: 'all' | 'regist' | 'class' — loss composition, as the
        reference's --train_target flag (ref train20v2learn_wandb.py:756-793).

        extra_valid_datasets: optional {prefix: dataset} — additional
        validation splits evaluated every epoch with their own best-model
        tracking, snapshots saved as '{prefix}model_rotation_best' etc.
        (the reference hardcodes two such splits, 'af_' and 'ni_', ref
        train20v2learn_wandb.py:472-699 validate_old_town_a/_n)."""
        self.model = model
        self.cfg = cfg
        self.proj = proj
        self.train_target = train_target
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

        # multi-host: this process loads only its slice of each global
        # batch; single-process this is the whole batch (parallel/distributed)
        from i2pnet_tpu.parallel import host_batch_slice, process_info

        self._host_slice = (
            host_batch_slice(batch_size) if process_info()[1] > 1 else None
        )
        self.train_loader = BatchLoader(
            train_dataset, batch_size, shuffle=True, seed=seed, device_only=True,
            num_workers=num_workers, host_slice=self._host_slice,
        )
        self.valid_loader = (
            BatchLoader(
                valid_dataset, batch_size, shuffle=False, seed=seed, drop_last=False
            )
            if valid_dataset is not None
            else None
        )
        self.extra_valid_loaders = {
            prefix: BatchLoader(ds, batch_size, shuffle=False, seed=seed,
                                drop_last=False)
            for prefix, ds in (extra_valid_datasets or {}).items()
        }
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
            if sample.get("calib") is not None:
                init_kw["calib"] = sample["calib"]  # efgh variant
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
            step_fn = make_accum_train_step(
                self.model, cfg, accum_steps, proj=proj, train_target=train_target
            )
        else:
            step_fn = (
                make_train_step_proj(self.model, cfg)
                if proj
                else make_train_step(self.model, cfg, train_target=train_target)
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

        def _fresh_best():
            # acc is maximized (ref tracks best_acc upward,
            # train20v2learn_wandb.py:462-468); the rest minimized
            return {"rotation": np.inf, "translation": np.inf,
                    "msee": np.inf, "acc": -np.inf}

        self.best = _fresh_best()
        self.extra_best = {p: _fresh_best() for p in self.extra_valid_loaders}
        if resume and self.ckpt.latest_step() is not None:
            self.state, meta = self.ckpt.restore(self.state)
            self.state = jax.device_put(self.state, replicate_spec(self.mesh))
            if meta:
                self.start_epoch = int(meta.get("epoch", 0)) + 1
                self.n_iter = int(meta.get("n_iter", 0))
                self.best = {**self.best, **meta.get("best", {})}
                for p, b in (meta.get("extra_best") or {}).items():
                    if p in self.extra_best:
                        self.extra_best[p] = {**self.extra_best[p], **b}
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
            losses_dev = []  # device scalars; pulled once at epoch end
            for bi, batch in enumerate(self.train_loader):
                mb = to_model_batch(batch)
                # single-process: a sharded device_put; multi-host: the
                # global array is assembled from per-process shards
                from i2pnet_tpu.parallel import make_global_batch

                mb = make_global_batch(
                    self.mesh, {k: np.asarray(v) for k, v in mb.items()}
                )
                rng, step_rng = jax.random.split(rng)
                self.state, m = self._train_step(self.state, mb, step_rng)
                self.n_iter += 1
                losses_dev.append(m["loss"])
                if bi % self.save_rate == 0:
                    loss = float(m["loss"])
                    self.writer.add_scalar("train/loss", loss, self.n_iter)
                    self.writer.add_scalar("train/loss_q", float(m["loss_q"]), self.n_iter)
                    self.writer.add_scalar("train/loss_x", float(m["loss_x"]), self.n_iter)
                    self.writer.text_log(
                        "log.txt",
                        f"epoch {epoch} iter {self.n_iter} loss {loss:.6f}",
                    )
            dt = time.time() - t0
            # the per-batch values stayed on device (no pipeline stall);
            # this is the TRUE epoch mean, not a save_rate subsample.
            # stack on device and pull ONCE: per-scalar device_get over the
            # axon transport pays a ~3 ms dispatch floor each (CLAUDE.md)
            mean_loss = (
                float(np.asarray(jnp.mean(jnp.stack(losses_dev))))
                if losses_dev else float("nan")
            )
            self.writer.add_scalar("train/epoch_time_s", dt, epoch)
            print(f"[trainer] epoch {epoch}: mean loss {mean_loss:.4f} ({dt:.1f}s)")

            if self.valid_loader is not None:
                self._validate_and_track(self.valid_loader, self.best, "", epoch)
            for prefix, loader in self.extra_valid_loaders.items():
                self._validate_and_track(loader, self.extra_best[prefix],
                                         prefix, epoch)

            self.ckpt.save(
                epoch,
                self.state,
                meta={"epoch": epoch, "n_iter": self.n_iter,
                      "best": self.best, "extra_best": self.extra_best},
            )
        self.ckpt.wait()

    def _validate_and_track(self, loader, best, prefix: str, epoch: int) -> None:
        """Validate one split and snapshot per-metric bests, named with the
        split's prefix ('' = main; e.g. 'af_'/'ni_' reproduce the reference's
        extra-split snapshots, ref train20v2learn_wandb.py:450-470,570-585,
        685-699)."""
        val = self.validate(loader)
        tag = f"val_{prefix.rstrip('_')}" if prefix else "val"
        for k, v in val.items():
            self.writer.add_scalar(f"{tag}/{k}", v, epoch)
        self.writer.text_log(
            "log_rotate.txt", f"epoch {epoch} {prefix}rre {val['rre_mean']:.6f}"
        )
        self.writer.text_log(
            "log_trans.txt", f"epoch {epoch} {prefix}rte {val['rte_mean']:.6f}"
        )
        snapshot = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        if self.train_target == "class":
            # classification-only runs track mask accuracy alone
            # (ref :465-468 'model_acc_best.pt')
            if val["acc"] > best["acc"]:
                best["acc"] = val["acc"]
                self.ckpt.save_best(f"{prefix}model_acc_best", snapshot)
            return
        if val["rre_mean"] < best["rotation"]:
            best["rotation"] = val["rre_mean"]
            self.ckpt.save_best(f"{prefix}model_rotation_best", snapshot)
        if val["rte_mean"] < best["translation"]:
            best["translation"] = val["rte_mean"]
            self.ckpt.save_best(f"{prefix}model_transition_best", snapshot)
        if val["msee"] < best["msee"]:
            best["msee"] = val["msee"]
            self.ckpt.save_best(f"{prefix}model_msee_best", snapshot)
        # regist/all mode records the best accuracy without a snapshot
        # (ref :462-463)
        best["acc"] = max(best["acc"], val["acc"])

    def _mask_accuracy(self, out, mb_dev, batch) -> Optional[np.ndarray]:
        """Per-sample projection-mask accuracy for one eval batch, mirroring
        the reference's head selection (ref train20v2learn_wandb.py:380-389:
        pm3 if layer_mask[1] else pm4; one_head_mask uses pm3) and
        metric.py:167-179 eval_acc (gt labels recomputed at the head's own
        point level pm[1])."""
        if self.proj:
            # the proj harness computes no mask accuracy (its model has no
            # mask heads, ref train20v2learn_wandb_proj.py)
            return None
        cfg = self.cfg
        if cfg.use_projection_mask:
            if out.get("pm3") is not None and cfg.layer_mask[1]:
                pm, sigmoid = out["pm3"], cfg.mask_sigmoid
            elif out.get("pm4") is not None and cfg.layer_mask[0]:
                pm, sigmoid = out["pm4"], cfg.mask_sigmoid
            else:
                return None
        elif out.get("pm3") is not None and cfg.one_head_mask:
            # ref :388-389 passes no sigmoid flag here (defaults False)
            pm, sigmoid = out["pm3"], False
        else:
            return None
        from i2pnet_tpu.losses import get_projection_gt

        if len(pm) >= 3 and pm[2] is not None:
            l_gt = np.asarray(pm[2]).argmax(-1)
        else:
            l_gt = np.asarray(
                get_projection_gt(
                    pm[1],
                    mb_dev["intrinsic"],
                    tuple(mb_dev["rgb"].shape[1:3]),
                    jnp.asarray(batch["decalib_real_gt"]),
                    jnp.asarray(batch["decalib_dual_gt"]),
                )
            )
        return M.eval_acc(np.asarray(pm[0]), l_gt, sigmoid=sigmoid)

    def validate(self, loader=None) -> Dict[str, float]:
        ev = M.RteRreEval()
        axis_errs = []
        msees = []
        accs = []
        for batch in loader if loader is not None else self.valid_loader:
            mb = to_model_batch(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            mb_dev = {k: jnp.asarray(v) for k, v in mb.items()}
            out = self._eval_step(self.state, mb_dev)
            acc = self._mask_accuracy(out, mb_dev, batch)
            if acc is not None:
                accs.append(acc)
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
        if not axis_errs:
            raise ValueError(
                "validation loader produced no batches — the validation "
                "split is empty under this root_path"
            )
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
            # 0.0 when no mask head is enabled, like the reference's zeros
            # acclist (ref train20v2learn_wandb.py:380)
            "acc": float(np.concatenate(accs).mean()) if accs else 0.0,
        }
