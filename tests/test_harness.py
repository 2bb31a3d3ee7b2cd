"""End-to-end harness tests: Trainer (+checkpoint/resume) and Evaluator on
synthetic KITTI-CMR data with the tiny config."""

import os

import h5py
import numpy as np
import pytest

CALIB = (
    "P2: 64.0 0.0 64.0 0.0 0.0 64.0 32.0 0.0 0.0 0.0 1.0 0.0\n"
    "Tr: 1.0 0.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 0.0 1.0 0.0\n"
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("harness")
    rng = np.random.default_rng(0)
    for seq in (0, 3):
        seq_dir = root / "kitti_processed_CMRNet" / "sequences" / ("%02d" % seq)
        (seq_dir / "local_maps").mkdir(parents=True)
        (seq_dir / "image_2_npy").mkdir(parents=True)
        (seq_dir / "calib.txt").write_text(CALIB)
        for fi in range(4):
            pc = rng.uniform(-20, 20, size=(3, 600)).astype(np.float32)
            with h5py.File(seq_dir / "local_maps" / ("%06d.h5" % fi), "w") as hf:
                hf["PC"] = np.vstack([pc, np.ones((1, 600), np.float32)])
                hf["intensity"] = pc[:1]
            np.save(
                seq_dir / "image_2_npy" / ("%06d.npy" % fi),
                rng.integers(0, 255, size=(178, 128, 3), dtype=np.uint8),
            )
    return str(root)


def _make_datasets(root, cfg):
    from i2pnet_tpu.data import KittiOdometryCMRDataset

    train = KittiOdometryCMRDataset(
        root, mode="train", img_H=64, img_W=128,
        sample_point=cfg.lidar_in_points, seed=0,
    )
    valid = KittiOdometryCMRDataset(
        root, mode="test", img_H=64, img_W=128,
        sample_point=cfg.lidar_in_points, seed=0,
        test_rt=np.tile(
            np.array([[0.05, 0.02, -0.03, 0.3, -0.2, 0.1]], np.float32), (4, 1)
        ),
    )
    return train, valid


def test_trainer_end_to_end(synth_root, tmp_path):
    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from i2pnet_tpu.train.trainer import Trainer

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    train_ds, valid_ds = _make_datasets(synth_root, cfg)
    log_dir = str(tmp_path / "run")

    trainer = Trainer(
        model, cfg, train_ds, valid_ds, log_dir=log_dir,
        batch_size=2, epochs=2, seed=0, save_rate=1,
    )
    trainer.train()

    # artifacts
    assert os.path.exists(os.path.join(log_dir, "config.json"))
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(log_dir, "log.txt"))
    assert os.path.exists(os.path.join(log_dir, "log_rotate.txt"))
    assert trainer.ckpt.latest_step() == 1
    assert os.path.isdir(os.path.join(log_dir, "best", "model_rotation_best"))
    assert os.path.isdir(os.path.join(log_dir, "best", "model_msee_best"))
    assert os.path.exists(os.path.join(log_dir, "src_snapshot.tar.gz"))

    # resume: continues from epoch 2 without config mismatch
    trainer2 = Trainer(
        model, cfg, train_ds, valid_ds, log_dir=log_dir,
        batch_size=2, epochs=3, seed=0, save_rate=1, resume=True,
    )
    assert trainer2.start_epoch == 2
    trainer2.train()
    assert trainer2.ckpt.latest_step() == 2

    # config-mismatch guard (ref train20v2learn_wandb.py:127-137)
    with pytest.raises(ValueError):
        Trainer(
            model, cfg, train_ds, valid_ds, log_dir=log_dir,
            batch_size=4, epochs=3, seed=0, resume=True,
        )


def test_trainer_extra_splits_and_mask_acc(synth_root, tmp_path):
    """Extra validation splits get their own prefixed best snapshots
    (ref train20v2learn_wandb.py validate_old_town_a/_n 'af_'/'ni_') and the
    mask-enabled config reports a real mask accuracy (ref :380-389)."""
    import dataclasses

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from i2pnet_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(
        I2PNetConfig.tiny(),
        use_projection_mask=True,
        layer_mask=(True, True),
        projection_mask_mlps=((16, 16), (16, 16)),
    )
    model = I2PNet(cfg)
    train_ds, valid_ds = _make_datasets(synth_root, cfg)
    log_dir = str(tmp_path / "run_extra")

    trainer = Trainer(
        model, cfg, train_ds, valid_ds, log_dir=log_dir,
        batch_size=2, epochs=1, seed=0, save_rate=1,
        extra_valid_datasets={"af_": valid_ds},
    )
    trainer.train()

    val = trainer.validate()
    assert 0.0 < val["acc"] <= 1.0
    assert trainer.best["acc"] > 0.0
    assert os.path.isdir(os.path.join(log_dir, "best", "af_model_rotation_best"))
    assert os.path.isdir(os.path.join(log_dir, "best", "af_model_transition_best"))
    assert trainer.extra_best["af_"]["rotation"] < np.inf


def test_trainer_with_multiprocess_workers(synth_root, tmp_path):
    """Trainer end-to-end with num_workers=2: the persistent forked pool
    feeds the jitted step across TWO epochs (pool reuse after the JAX
    runtime is live in the parent), and a repeat run is bit-for-bit
    reproducible (the multiprocess path reseeds augmentation per
    (seed, epoch, batch) — deterministic for a given seed, though a
    DIFFERENT legitimate stream than the sequential single-thread rng)."""
    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from i2pnet_tpu.train.trainer import Trainer

    cfg = I2PNetConfig.tiny()

    def run(num_workers, tag):
        model = I2PNet(cfg)
        train_ds, valid_ds = _make_datasets(synth_root, cfg)
        trainer = Trainer(
            model, cfg, train_ds, valid_ds,
            log_dir=str(tmp_path / f"run_{tag}"),
            batch_size=2, epochs=2, seed=0, save_rate=1,
            num_workers=num_workers,
        )
        trainer.train()
        val = trainer.validate()
        trainer.train_loader.close()
        return val

    v2a = run(2, "w2a")
    assert np.isfinite(v2a["rre_mean"]) and np.isfinite(v2a["rte_mean"])
    v2b = run(2, "w2b")
    assert v2a["rre_mean"] == v2b["rre_mean"], (v2a, v2b)
    assert v2a["rte_mean"] == v2b["rte_mean"]


def test_trainer_gt_mask_delay_anneals_in_real_run(synth_root, tmp_path):
    """mask_delay=True must actually anneal gt->pred masks over a real
    Trainer.train() run: no gt_project is ever hand-passed — the step
    computes it from the flag (ref train20v2learn_wandb.py:732-751) and
    the DelayWeight counter follows the global optimizer step
    (ref MainModules.py:431-449)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from i2pnet_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(
        I2PNetConfig.tiny(),
        use_projection_mask=True,
        layer_mask=(True, True),
        ground_truth_mask_layer=(True, True),
        ground_truth_projection_mask=True,
        ground_truth_projection_mask_eval=True,
        mask_delay=True,
        mask_delay_step=1,  # anneal completes after one optimizer step
        projection_mask_mlps=((16, 16), (16, 16)),
    )
    model = I2PNet(cfg)
    train_ds, valid_ds = _make_datasets(synth_root, cfg)
    log_dir = str(tmp_path / "run_gt_delay")

    trainer = Trainer(
        model, cfg, train_ds, valid_ds, log_dir=log_dir,
        batch_size=2, epochs=1, seed=0, save_rate=1,
    )
    trainer.train()
    assert int(trainer.state.step) >= 2  # past the delay window

    # same trained params, same batch: step 0 (pure gt masks) vs the
    # trained step (pure predicted masks) must give different poses —
    # proof the anneal moved during the run
    batch = next(iter(trainer.valid_loader))
    from i2pnet_tpu.data.pipeline import to_model_batch

    mb = {k: jnp.asarray(v) for k, v in to_model_batch(
        {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    ).items()}
    out_trained = trainer._eval_step(trainer.state, mb)
    out_step0 = trainer._eval_step(
        trainer.state.replace(step=jnp.asarray(0)), mb
    )
    assert not np.allclose(
        np.asarray(out_trained["out3"]), np.asarray(out_step0["out3"])
    )
    # mask accuracy is computed against the eval-time gt labels
    val = trainer.validate()
    assert 0.0 < val["acc"] <= 1.0


def test_evaluator_end_to_end(synth_root, tmp_path):
    import jax

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.data.pipeline import BatchLoader
    from i2pnet_tpu.eval import Evaluator, recall_analysis
    from i2pnet_tpu.eval.analysis import (
        aggregate_seeds,
        parse_prediction_file,
        prediction_file_metrics,
    )
    from i2pnet_tpu.models import I2PNet

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    _, valid_ds = _make_datasets(synth_root, cfg)
    s = valid_ds[0]
    import jax.numpy as jnp

    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s["rgb"])[None],
        jnp.asarray(s["lidar"])[None],
        jnp.asarray(s["init_intrinsic"])[None],
        train=False,
    )

    log_dir = str(tmp_path / "eval")
    evaluator = Evaluator(
        model, cfg, [variables["params"]],
        [variables.get("batch_stats", {})], log_dir=log_dir,
    )
    loader = BatchLoader(valid_ds, 2, shuffle=False, drop_last=False)
    summary = evaluator.validate(loader)
    assert summary["count"] == 4
    assert np.isfinite(summary["rre_mean"])
    assert np.isfinite(summary["msee"])
    assert summary["mean_fps"] > 0

    pred_path = os.path.join(log_dir, "prediction.txt")
    mats = parse_prediction_file(pred_path)
    assert mats["pred"].shape == (4, 3, 4)
    pm = prediction_file_metrics(pred_path)
    np.testing.assert_allclose(pm["rre_mean"], summary["rre_mean"], rtol=1e-5)
    agg = aggregate_seeds(os.path.join(log_dir, "prediction*.txt"))
    assert agg["seeds"] == 1

    import glob

    npz = sorted(glob.glob(os.path.join(log_dir, "metrics_*.npz")))[-1]
    ra = recall_analysis(npz)
    assert ra["count"] == 4


def test_evaluator_dp_mesh(synth_root, tmp_path):
    """Evaluator(mesh=...) fans batches over a pure-DP mesh — params
    replicated, batch sharded on axis 0, ragged final batch padded to the
    device count and trimmed — and reproduces the single-device metrics
    (round-4 verdict item 2c; SURVEY §5.8 eval fan-out)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.data.pipeline import BatchLoader
    from i2pnet_tpu.eval import Evaluator
    from i2pnet_tpu.models import I2PNet

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    _, valid_ds = _make_datasets(synth_root, cfg)
    s = valid_ds[0]
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s["rgb"])[None],
        jnp.asarray(s["lidar"])[None],
        jnp.asarray(s["init_intrinsic"])[None],
        train=False,
    )
    args = (model, cfg, [variables["params"]],
            [variables.get("batch_stats", {})])

    # batch 3 over 4 samples: a full batch of 3 (pads to 4 on the 2-device
    # mesh) and a ragged final batch of 1 (pads to 2). The dataset RNG is
    # re-seeded before each run so both see identical decalibrations
    # (evaluate.py does the same between cascade template fetch and eval).
    valid_ds.rng = np.random.default_rng(0)
    ref = Evaluator(*args, log_dir=str(tmp_path / "ref")).validate(
        BatchLoader(valid_ds, 3, shuffle=False, drop_last=False))
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    valid_ds.rng = np.random.default_rng(0)
    dp = Evaluator(*args, log_dir=str(tmp_path / "dp"), mesh=mesh).validate(
        BatchLoader(valid_ds, 3, shuffle=False, drop_last=False))

    assert dp["count"] == ref["count"] == 4
    # per-example eval: only sharded-executable fp rounding differs
    # (measured out3 delta ~1e-6); a padding/trim or routing defect would
    # show at O(1)
    for k in ("rte_mean", "rre_mean", "msee", "yaw_deg", "x_m"):
        np.testing.assert_allclose(
            dp[k], ref[k], rtol=1e-3, atol=1e-4, err_msg=k)


def test_evaluator_vis_fanout(synth_root, tmp_path):
    """vis_rate logs init/pred/gt overlays + an NHWC comparison batch per
    sampled batch, with the reference's tags (ref evaluation.py:630-657)."""
    import jax
    import jax.numpy as jnp

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.data.pipeline import BatchLoader
    from i2pnet_tpu.eval import Evaluator
    from i2pnet_tpu.models import I2PNet

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    _, valid_ds = _make_datasets(synth_root, cfg)
    s = valid_ds[0]
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s["rgb"])[None],
        jnp.asarray(s["lidar"])[None],
        jnp.asarray(s["init_intrinsic"])[None],
        train=False,
    )

    class _Writer:
        images = []
        batches = []

        def add_image(self, tag, img, step):
            self.images.append((tag, np.asarray(img).shape, step))

        def add_images(self, tag, imgs, step):
            self.batches.append((tag, np.asarray(imgs).shape, step))

    w = _Writer()
    evaluator = Evaluator(
        model, cfg, [variables["params"]],
        [variables.get("batch_stats", {})],
        log_dir=str(tmp_path / "eval"), writer=w, vis_rate=2,
    )
    loader = BatchLoader(valid_ds, 2, shuffle=False, drop_last=False)
    evaluator.validate(loader)  # 4 samples / batch 2 -> batches 0,1; rate 2 -> batch 0 only
    tags = [t for t, _, _ in w.images]
    assert tags == [
        "init_projected_img", "pj_projected_img", "gt_projected_img"]
    h, ww = np.asarray(s["rgb"]).shape[:2]
    assert all(shape == (h, ww, 3) for _, shape, _ in w.images)
    assert w.batches == [("comparison_img", (3, h, ww, 3), 0)]


def test_evaluator_cascade(synth_root, tmp_path):
    """Two-stage cascade composes predictions (ref evaluation_cmr.py:330-377)."""
    import jax
    import jax.numpy as jnp

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.data.pipeline import BatchLoader
    from i2pnet_tpu.eval import Evaluator
    from i2pnet_tpu.models import I2PNet

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    _, valid_ds = _make_datasets(synth_root, cfg)
    s = valid_ds[0]
    variables = model.init(
        jax.random.key(0),
        jnp.asarray(s["rgb"])[None],
        jnp.asarray(s["lidar"])[None],
        jnp.asarray(s["init_intrinsic"])[None],
        train=False,
    )
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    evaluator = Evaluator(
        model, cfg, [p, p], [bs, bs], log_dir=str(tmp_path / "cascade")
    )
    loader = BatchLoader(valid_ds, 2, shuffle=False, drop_last=False)
    summary = evaluator.validate(loader)
    assert summary["count"] == 4
    assert np.isfinite(summary["rre_mean"])


def test_analysis_cli_main(synth_root, tmp_path, capsys):
    """python -m i2pnet_tpu.eval.analysis <prediction.txt> prints metrics
    JSON (mirrors ref evaluation_cmrresult.py re-parse)."""
    import json

    import jax
    import jax.numpy as jnp

    from i2pnet_tpu import eval as _  # noqa: F401
    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.data.pipeline import BatchLoader
    from i2pnet_tpu.eval import Evaluator
    from i2pnet_tpu.eval.analysis import main as analysis_main
    from i2pnet_tpu.models import I2PNet

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    _, valid_ds = _make_datasets(synth_root, cfg)
    s = valid_ds[0]
    variables = model.init(
        jax.random.key(0), jnp.asarray(s["rgb"])[None],
        jnp.asarray(s["lidar"])[None], jnp.asarray(s["init_intrinsic"])[None],
        train=False,
    )
    log_dir = str(tmp_path / "acli")
    ev = Evaluator(model, cfg, [variables["params"]],
                   [variables.get("batch_stats", {})], log_dir=log_dir)
    summary = ev.validate(BatchLoader(valid_ds, 2, shuffle=False, drop_last=False))
    capsys.readouterr()

    analysis_main([os.path.join(log_dir, "prediction.txt")])
    out = json.loads(capsys.readouterr().out)
    assert out["count"] == 4
    np.testing.assert_allclose(out["rre_mean"], summary["rre_mean"], rtol=1e-5)
