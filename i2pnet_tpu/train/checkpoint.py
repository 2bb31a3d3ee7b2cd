"""Checkpoint / resume via orbax (ref SURVEY.md §5.4).

Reproduces the reference's artifact set (ref train20v2learn_wandb.py:267-281,
:450-470): per-epoch full state (train state + counters + best-metric
watermarks) with retention, plus named best-model snapshots
(model_rotation_best / model_transition_best / ...). Frequent checkpoints
double as preemption recovery on TPU.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self._mngr = ocp.CheckpointManager(
            os.path.join(directory, "ckpt"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_dir = os.path.join(directory, "best")
        os.makedirs(self._best_dir, exist_ok=True)
        self._best: Dict[str, ocp.StandardCheckpointer] = {}

    def save(self, step: int, state: Any, meta: Optional[dict] = None) -> None:
        args = {"state": ocp.args.StandardSave(state)}
        if meta is not None:
            args["meta"] = ocp.args.JsonSave(meta)
        self._mngr.save(step, args=ocp.args.Composite(**args))

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None):
        """Returns (state, meta). abstract_state: a pytree of the same
        structure (e.g. the freshly created state)."""
        step = step if step is not None else self.latest_step()
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored.get("meta")

    def save_best(self, name: str, state: Any) -> None:
        """Overwrite the named best snapshot (e.g. 'model_rotation_best')."""
        path = os.path.join(self._best_dir, name)
        ckptr = ocp.StandardCheckpointer()
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, state)
        ckptr.wait_until_finished()

    def restore_best(self, name: str, abstract_state: Any):
        path = os.path.join(self._best_dir, name)
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, abstract_state)

    def close(self) -> None:
        self._mngr.close()


def restore_inference_variables(
    log_dir: str, model, variables: dict, best: str = "model_rotation_best"
):
    """(params, batch_stats) for inference from a training log dir.

    best='latest' restores the newest FULL train state; the abstract state
    is rebuilt with the optimizer hyperparams recorded in the run's
    config.json (a clip > 0 run has an extra optax stage, so a
    default-hyperparam template has a different opt_state structure and
    orbax refuses to restore). Named snapshots restore params/batch_stats
    only. Shared by evaluate.py, tools/export_model.py, tools/render_demo.py.
    """
    import json

    mgr = CheckpointManager(log_dir)
    if best == "latest":
        from i2pnet_tpu.train.state import create_train_state

        hp = {}
        cfg_path = os.path.join(log_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                dumped = json.load(f)
            hp = {
                k: dumped[k]
                for k in ("lr", "weight_decay", "clip")
                if k in dumped
            }
        abstract = create_train_state(model, variables, **hp)
        state, _ = mgr.restore(abstract)
        return state.params, state.batch_stats
    if not os.path.isdir(os.path.join(log_dir, "best", best)):
        # no best snapshot (e.g. the run had no validation split):
        # degrade to the newest full train state instead of failing
        import warnings

        warnings.warn(
            f"best snapshot '{best}' absent under {log_dir}/best; "
            "restoring the latest full train state instead"
        )
        return restore_inference_variables(log_dir, model, variables, "latest")
    restored = mgr.restore_best(
        best,
        {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
    )
    return restored["params"], restored["batch_stats"]
