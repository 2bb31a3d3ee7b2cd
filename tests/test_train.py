"""Train-step tests: convergence on a synthetic task and multichip dry run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2pnet_tpu.config import I2PNetConfig
from i2pnet_tpu.models import I2PNet
from i2pnet_tpu.train import create_train_state, make_train_step


def _synthetic_batch(cfg, B=2, h=64, w=128, seed=0):
    rng = np.random.default_rng(seed)
    rgb = jnp.asarray(rng.normal(size=(B, h, w, 3)).astype(np.float32))
    lidar = jnp.asarray(
        rng.uniform(-10, 10, size=(B, cfg.lidar_in_points, 3)).astype(np.float32)
    )
    lidar = lidar.at[..., 2].add(20.0)
    intrinsic = jnp.tile(
        jnp.asarray([[[64.0, 0, 64], [0, 64.0, 32], [0, 0, 1]]], jnp.float32),
        (B, 1, 1),
    )
    angle = 0.1
    q_gt = jnp.tile(
        jnp.asarray([[np.cos(angle / 2), 0.0, np.sin(angle / 2), 0.0]], jnp.float32),
        (B, 1),
    )
    t_gt = jnp.tile(jnp.asarray([[0.5, -0.2, 0.1]], jnp.float32), (B, 1))
    return {
        "rgb": rgb,
        "lidar": lidar,
        "intrinsic": intrinsic,
        "decalib_q_gt": q_gt,
        "decalib_t_gt": t_gt,
    }


def test_train_step_decreases_loss():
    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    batch = _synthetic_batch(cfg)
    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        train=False,
    )
    state = create_train_state(model, variables, lr=1e-3, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))

    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


def test_dryrun_multichip_8(monkeypatch):
    import __graft_entry__

    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices
    # full-shape compile is covered by test_dryrun_multichip_full_shapes
    # (--run-slow) and the driver run; keep the default suite fast
    monkeypatch.setenv("I2PNET_SKIP_FULL_DRYRUN", "1")
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.skipif(
    "not config.getoption('--run-slow', default=False)",
    reason="~4 min of production-shape XLA compile on this 1-core box "
    "(the driver's dryrun_multichip also runs it each round)",
)
def test_dryrun_multichip_full_shapes():
    """The SHIPPED configs must lay out on an 8-device mesh (compile-only,
    production shapes) — the recorded-artifact version of what PARITY.md
    used to claim as prose."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip_full(8)


@pytest.mark.skipif(
    "not config.getoption('--run-slow', default=False)",
    reason="full-config compile is minutes on this 1-core box; driver "
    "compile-checks entry() on TPU anyway (run with --run-slow)",
)
def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out3, out4 = jax.jit(fn)(*args)
    assert out3.shape == (1, 7) and out4.shape == (1, 7)
    assert bool(jnp.isfinite(out3).all())


def test_projection_mask_training_path():
    """End-to-end train step with the projection-mask heads enabled
    (use_projection_mask + gt delay, ref modellearn.py:150-163, :256-341
    and compute_loss.py:19-37)."""
    import dataclasses

    from i2pnet_tpu import metrics as M
    from i2pnet_tpu.losses import get_projection_gt

    cfg = dataclasses.replace(
        I2PNetConfig.tiny(),
        use_projection_mask=True,
        layer_mask=(True, True),
        ground_truth_mask_layer=(True, True),
        mask_delay=True,
        mask_delay_step=100,
        projection_mask_mlps=((16, 16), (16, 16)),
    )
    model = I2PNet(cfg)
    batch = _synthetic_batch(cfg)
    gp_labels = get_projection_gt(
        batch["lidar"], batch["intrinsic"], (64, 128),
        batch["decalib_q_gt"], batch["decalib_t_gt"],
    )
    batch["gt_project"] = jax.nn.one_hot(gp_labels, 2)

    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        gt_project=batch["gt_project"], train=False,
    )
    state = create_train_state(model, variables, lr=1e-3, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    losses = []
    for i in range(4):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses

    # eval: mask heads produce logits; eval_acc computes accuracy vs gt
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["rgb"], batch["lidar"], batch["intrinsic"], train=False,
    )
    assert out["pm3"] is not None and out["pm4"] is not None
    pm3_logits = np.asarray(out["pm3"][0])
    assert pm3_logits.shape[-1] == 2
    # gt labels at l3 need the fps subsampling; just check accuracy math runs
    acc = M.eval_acc(pm3_logits, np.zeros(pm3_logits.shape[:2], np.int64))
    assert acc.shape == (2,)


def test_train_target_loss_composition():
    """loss('all') == loss('regist') + 1.5 * loss('class') at identical
    params/batch/rng (ref train20v2learn_wandb.py:756-793 --train_target)."""
    import dataclasses

    from i2pnet_tpu.train.step import _free_point_loss_fn

    cfg = dataclasses.replace(
        I2PNetConfig.tiny(),
        use_projection_mask=True,
        layer_mask=(True, True),
        projection_mask_mlps=((16, 16), (16, 16)),
    )
    model = I2PNet(cfg)
    batch = _synthetic_batch(cfg)
    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        train=False,
    )

    def loss_for(target):
        fn = _free_point_loss_fn(model, cfg, train_target=target)
        loss, _ = fn(variables["params"], variables["batch_stats"], batch,
                     jax.random.key(1), jnp.asarray(0))
        return float(loss)

    l_all, l_reg, l_cls = loss_for("all"), loss_for("regist"), loss_for("class")
    np.testing.assert_allclose(l_all, l_reg + 1.5 * l_cls, rtol=1e-5)
    with pytest.raises(ValueError):
        _free_point_loss_fn(model, cfg, train_target="bogus")


def test_delay_weight_anneals_with_global_step():
    """With mask_delay=True the gt->pred mask blend must move as training
    advances (ref MainModules.py:431-449 decrements now_step once per
    training forward; our counter is max(delay_step - state.step, 0))."""
    import dataclasses

    from i2pnet_tpu.losses import get_projection_gt
    from i2pnet_tpu.train.step import _delay_now_step

    cfg = dataclasses.replace(
        I2PNetConfig.tiny(),
        use_projection_mask=True,
        layer_mask=(True, True),
        ground_truth_mask_layer=(True, True),
        mask_delay=True,
        mask_delay_step=4,
        projection_mask_mlps=((16, 16), (16, 16)),
    )
    # counter math: counts down from delay_step, clips at 0
    assert float(_delay_now_step(cfg, jnp.asarray(0))) == 4.0
    assert float(_delay_now_step(cfg, jnp.asarray(3))) == 1.0
    assert float(_delay_now_step(cfg, jnp.asarray(99))) == 0.0
    assert _delay_now_step(dataclasses.replace(cfg, mask_delay=False), None) is None

    model = I2PNet(cfg)
    batch = _synthetic_batch(cfg)
    gp_labels = get_projection_gt(
        batch["lidar"], batch["intrinsic"], (64, 128),
        batch["decalib_q_gt"], batch["decalib_t_gt"],
    )
    batch["gt_project"] = jax.nn.one_hot(gp_labels, 2)
    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        gt_project=batch["gt_project"], train=False,
    )
    state = create_train_state(model, variables, lr=1e-3, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg))

    # identical params/batch/rng, different global step -> the delay blend
    # (and nothing else) changes, so the loss must differ: at step 0 the
    # heads see pure gt masks, at step >= delay_step pure predicted masks
    _, m0 = step(state, batch, jax.random.key(0))
    _, m_late = step(state.replace(step=jnp.asarray(50)), batch, jax.random.key(0))
    assert float(m0["loss"]) != float(m_late["loss"])


def test_gt_mask_flag_computes_labels_inside_step():
    """With ground_truth_projection_mask=True the jitted step must build
    gt_project on device — flipping the flag changes training, with no
    hand-passed array (ref train20v2learn_wandb.py:732-736 computes it
    in-loop when the flag is set)."""
    import dataclasses

    from i2pnet_tpu.losses import get_projection_gt
    from i2pnet_tpu.train.step import _free_point_loss_fn

    base = dataclasses.replace(
        I2PNetConfig.tiny(),
        use_projection_mask=True,
        layer_mask=(True, True),
        ground_truth_mask_layer=(True, True),
        projection_mask_mlps=((16, 16), (16, 16)),
    )
    cfg_gt = dataclasses.replace(base, ground_truth_projection_mask=True)
    model_gt = I2PNet(cfg_gt)
    batch = _synthetic_batch(base)  # deliberately NO gt_project key
    variables = I2PNet(base).init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        train=False,
    )

    def loss_for(cfg, extra=None):
        b = dict(batch, **(extra or {}))
        fn = _free_point_loss_fn(I2PNet(cfg), cfg)
        loss, _ = fn(variables["params"], variables["batch_stats"], b,
                     jax.random.key(1), jnp.asarray(0))
        return float(loss)

    l_off = loss_for(base)
    l_on = loss_for(cfg_gt)
    assert l_on != l_off  # the flag changes behavior with no gt in the batch

    # the on-device labels equal the hand-computed path the tests used
    gp = jax.nn.one_hot(
        get_projection_gt(batch["lidar"], batch["intrinsic"], (64, 128),
                          batch["decalib_q_gt"], batch["decalib_t_gt"]), 2)
    np.testing.assert_allclose(l_on, loss_for(cfg_gt, {"gt_project": gp}),
                               rtol=1e-6)
    # handing the model gt masks without the flag gives the same blend
    np.testing.assert_allclose(l_on, loss_for(base, {"gt_project": gp}),
                               rtol=1e-6)

    # eval flag: make_eval_step computes gt when ..._mask_eval is set
    from i2pnet_tpu.train import make_eval_step

    cfg_ev = dataclasses.replace(base, ground_truth_projection_mask_eval=True)
    state = create_train_state(I2PNet(cfg_ev), variables, steps_per_epoch=10)
    out_ev = make_eval_step(I2PNet(cfg_ev), cfg_ev)(state, batch)
    out_plain = make_eval_step(I2PNet(base), base)(state, batch)
    assert not np.allclose(np.asarray(out_ev["out3"]),
                           np.asarray(out_plain["out3"]))
    out_hand = make_eval_step(I2PNet(base), base)(state, dict(batch, gt_project=gp))
    np.testing.assert_allclose(np.asarray(out_ev["out3"]),
                               np.asarray(out_hand["out3"]), rtol=1e-6)


def test_efgh_train_step_threads_calib():
    """cfg.efgh + batch['calib'] flow through the jitted train step
    (ref train20v2learn_wandb.py:741-751 threads data['calib'])."""
    import dataclasses

    cfg = dataclasses.replace(I2PNetConfig.tiny(), efgh=True)
    model = I2PNet(cfg)
    batch = _synthetic_batch(cfg)
    B = batch["rgb"].shape[0]
    batch["calib"] = jnp.concatenate(
        [batch["intrinsic"], jnp.zeros((B, 3, 1), jnp.float32)], axis=-1
    )
    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        calib=batch["calib"], train=False,
    )
    state = create_train_state(model, variables, lr=1e-3, steps_per_epoch=10)
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses


def test_timings_profiler():
    from i2pnet_tpu.utils import Timings

    t = Timings()
    t.reset()
    x = jnp.ones((64, 64))
    y = x @ x
    t.time("matmul", y)
    s = t.summary()
    assert "matmul" in s and s["matmul"]["count"] == 1
    assert str(t)


def test_training_determinism():
    """Same seeds -> bit-identical losses (the reference relies on fixed
    seeds as its reproducibility harness, SURVEY §4.4; JAX gives us full
    determinism)."""
    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    batch = _synthetic_batch(cfg)

    def run():
        variables = model.init(
            jax.random.key(0), batch["rgb"], batch["lidar"],
            batch["intrinsic"], train=False,
        )
        state = create_train_state(model, variables, steps_per_epoch=100)
        step = jax.jit(make_train_step(model, cfg))
        out = []
        s = state
        for i in range(3):
            s, m = step(s, batch, jax.random.key(i))
            out.append(float(m["loss"]))
        return out

    a = run()
    b = run()
    assert a == b, (a, b)


def test_accum_step_matches_plain_at_1_and_runs_at_2():
    from i2pnet_tpu.train import make_accum_train_step

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    batch = _synthetic_batch(cfg, B=2)
    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        train=False,
    )

    def fresh_state():
        return create_train_state(model, variables, lr=1e-3, steps_per_epoch=100)

    plain = jax.jit(make_train_step(model, cfg))
    accum1 = jax.jit(make_accum_train_step(model, cfg, accum_steps=1))
    sp, mp = plain(fresh_state(), batch, jax.random.key(0))
    sa, ma = accum1(fresh_state(), batch, jax.random.key(0))
    np.testing.assert_allclose(float(mp["loss"]), float(ma["loss"]), rtol=1e-7)
    # Adam's first update is ~±lr per element regardless of grad magnitude,
    # so float-associativity noise in near-zero grads (scan fuses the
    # backward differently) can flip single elements by 2*lr. Bound by that.
    for a, b in zip(
        jax.tree_util.tree_leaves(sp.params), jax.tree_util.tree_leaves(sa.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)

    # accum_steps=2: grads averaged over 2 microbatches of 1; runs + updates
    accum2 = jax.jit(make_accum_train_step(model, cfg, accum_steps=2))
    s0 = fresh_state()
    s2, m2 = accum2(s0, batch, jax.random.key(0))
    assert np.isfinite(float(m2["loss"]))
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(s0.params), jax.tree_util.tree_leaves(s2.params)
        )
    ]
    assert max(diffs) > 0.0


def test_accum_step_on_device_mesh():
    """Gradient accumulation composes with DP sharding: the (B,) -> (A, B/A)
    reshape inside the jitted step must compile and run on a multi-device
    mesh (XLA inserts any resharding)."""
    from i2pnet_tpu.parallel import (
        batch_spec,
        make_mesh,
        replicate_spec,
        shard_train_step,
    )
    from i2pnet_tpu.train import make_accum_train_step

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    batch = _synthetic_batch(cfg, B=4)
    variables = model.init(
        jax.random.key(0), batch["rgb"], batch["lidar"], batch["intrinsic"],
        train=False,
    )
    state = create_train_state(model, variables, lr=1e-3, steps_per_epoch=100)

    mesh = make_mesh(jax.devices()[:2])
    step = shard_train_step(make_accum_train_step(model, cfg, accum_steps=2), mesh)
    state = jax.device_put(state, replicate_spec(mesh))
    batch = {k: jax.device_put(v, batch_spec(mesh)) for k, v in batch.items()}
    state, m = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_restore_inference_variables_with_clip_run(tmp_path):
    """'latest' eval restore must rebuild the optimizer with the RUN's
    hyperparams: a clip > 0 training run has an extra optax stage, so a
    default-hyperparam abstract state has a different opt_state structure
    and orbax refuses the restore (the bug evaluate.py/export/demo hit)."""
    import json
    import os

    import jax
    import jax.numpy as jnp

    from i2pnet_tpu.config import I2PNetConfig
    from i2pnet_tpu.models import I2PNet
    from i2pnet_tpu.train import create_train_state
    from i2pnet_tpu.train.checkpoint import (
        CheckpointManager,
        restore_inference_variables,
    )

    cfg = I2PNetConfig.tiny()
    model = I2PNet(cfg)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(1, 64, 128, 3)).astype(np.float32))
    lidar = jnp.asarray(
        rng.uniform(-5, 5, size=(1, 512, 3)).astype(np.float32)
    ).at[..., 2].add(12.0)
    intr = jnp.tile(
        jnp.asarray([[[64.0, 0, 64], [0, 64.0, 32], [0, 0, 1]]], jnp.float32),
        (1, 1, 1),
    )
    variables = model.init(jax.random.key(0), rgb, lidar, intr, train=False)

    log_dir = str(tmp_path / "run")
    state = create_train_state(model, variables, clip=1.0)
    mgr = CheckpointManager(log_dir)
    mgr.save(0, state, meta={"epoch": 0})
    mgr.wait()
    # the trainer's resolved-config dump records the hyperparams
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "config.json"), "w") as f:
        json.dump({"lr": 1e-3, "weight_decay": 1e-4, "clip": 1.0}, f)

    params, bstats = restore_inference_variables(
        log_dir, model, variables, best="latest"
    )
    leaf_saved = jax.tree_util.tree_leaves(state.params)[0]
    leaf_rest = jax.tree_util.tree_leaves(params)[0]
    np.testing.assert_array_equal(np.asarray(leaf_saved), np.asarray(leaf_rest))
