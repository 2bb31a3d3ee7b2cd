#!/usr/bin/env python
"""Export a trained model as a serialized StableHLO artifact for serving.

The reference deploys by shipping torch checkpoints plus the full Python
stack (ref evaluation_cmr.py loads state_dicts into live modules); here the
whole inference function — params baked in — is lowered once with
jax.export and serialized, so a serving host only needs jax to run it
(no i2pnet_tpu import, no flax, no retracing).

Usage:
  python tools/export_model.py --out /tmp/i2pnet.bin [--proj] [--tiny]
      [--batch 1] [--ckpt log/run] [--platforms tpu cpu]

Shapes are static (the serving norm on TPU; the Pallas FPS kernel requires
concrete tiles). Export per batch size you serve.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_inference(model, variables, proj: bool):
    """Returns fn(rgb, lidar[, raw_xyz], intrinsic) -> {"q","t"} with the
    weights closed over (the serving artifact is self-contained)."""
    import jax.numpy as jnp

    def free_point(rgb, lidar, intrinsic):
        out = model.apply(variables, rgb, lidar, intrinsic, train=False)
        return {"q": out["out3"][:, :4], "t": out["out3"][:, 4:]}

    def projective(rgb, lidar, raw_xyz, intrinsic):
        out = model.apply(variables, rgb, lidar, raw_xyz, intrinsic, train=False)
        return {"q": out["out3"][:, :4], "t": out["out3"][:, 4:]}

    return projective if proj else free_point


def example_inputs(cfg, proj: bool, batch: int, img_hw=None, points=None):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if proj:
        h, w = img_hw or (160, 512)
        # point budget scales with the config: a --tiny export should not
        # trace the 150k-point production shape
        n = points or (150000 if img_hw is None else 4096)
        raw = rng.normal(size=(batch, n, 3)).astype(np.float32) * 15
        raw[:, n - 30000:] = 0.0
        lidar = raw.copy()
        intr = np.tile(
            np.asarray([[[350.0, 0, w // 2], [0, 350.0, h // 2], [0, 0, 1]]],
                       np.float32), (batch, 1, 1))
        return (
            jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32)),
            jnp.asarray(lidar),
            jnp.asarray(raw),
            jnp.asarray(intr),
        )
    h, w = img_hw or (384, 1280)
    lidar = rng.uniform(-10, 10, size=(batch, cfg.lidar_in_points, 3)).astype(
        np.float32)
    lidar[..., 2] += 20.0
    intr = np.tile(
        np.asarray([[[718.0, 0, w // 2], [0, 718.0, h // 2], [0, 0, 1]]],
                   np.float32), (batch, 1, 1))
    return (
        jnp.asarray(rng.normal(size=(batch, h, w, 3)).astype(np.float32)),
        jnp.asarray(lidar),
        jnp.asarray(intr),
    )


def export_model(model, variables, cfg, proj: bool, batch: int,
                 platforms=None, img_hw=None) -> bytes:
    """Lower + serialize; returns the artifact bytes."""
    import jax
    from jax import export as jexport

    fn = build_inference(model, variables, proj)
    args = example_inputs(cfg, proj, batch, img_hw)
    exported = jexport.export(
        jax.jit(fn),
        platforms=platforms or [jax.default_backend()],
    )(*[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args])
    return exported.serialize()


def load_exported(blob: bytes):
    """Deserialize an artifact; returns fn(*args) runnable under jax.jit."""
    from jax import export as jexport

    return jexport.deserialize(blob).call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--proj", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ckpt", default=None,
                    help="Trainer log dir to load params from (latest step)")
    ap.add_argument("--best", default=None,
                    help="best-snapshot dir (model_rotation_best/...)")
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="target platforms, e.g. --platforms tpu cpu")
    args = ap.parse_args()

    from i2pnet_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    import jax

    from i2pnet_tpu.config import I2PNetConfig, I2PNetProjConfig
    from i2pnet_tpu.models import I2PNet, I2PNetProj

    if args.proj:
        cfg = I2PNetProjConfig.tiny() if args.tiny else I2PNetProjConfig()
        model = I2PNetProj(cfg)
        img_hw = (64, 128) if args.tiny else None
    else:
        cfg = I2PNetConfig.tiny() if args.tiny else I2PNetConfig()
        model = I2PNet(cfg)
        img_hw = (64, 128) if args.tiny else None

    ex = example_inputs(cfg, args.proj, args.batch, img_hw)
    variables = model.init(jax.random.key(0), *ex, train=False)
    if args.best:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.best),
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
        )
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
    elif args.ckpt:
        # reconstruct the optimizer with the run's recorded hyperparams
        # (a clip > 0 run has a different opt_state structure)
        from i2pnet_tpu.train.checkpoint import restore_inference_variables

        params, bstats = restore_inference_variables(
            args.ckpt, model, variables, best="latest"
        )
        variables = {"params": params, "batch_stats": bstats}

    blob = export_model(model, variables, cfg, args.proj, args.batch,
                        platforms=args.platforms, img_hw=img_hw)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB, "
          f"platforms={args.platforms or [jax.default_backend()]})")

    # roundtrip smoke: deserialize and run
    fn = load_exported(open(args.out, "rb").read())
    out = jax.jit(fn)(*ex)
    q = np.asarray(out["q"])
    print(f"roundtrip ok: q[0]={q[0].round(4).tolist()} |q|="
          f"{np.linalg.norm(q[0]):.4f}")


if __name__ == "__main__":
    main()
