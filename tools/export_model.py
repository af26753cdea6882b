"""Export a generator's inference function as a serialized StableHLO
artifact (jax.export) for runtime-independent serving.

The eval paths are pure functions of (params, inputs) with params passed
as arguments, so they export directly. The artifact is the portable
serialized form (stablehlo bytecode + calling convention) that any
StableHLO-consuming runtime (or jax.export.deserialize) can load.

Usage:
  python tools/export_model.py [--variant mnist|clevr|coco-stackgan]
      [--batch N] [--net_g PATH.pth | RUN_DIR] [--out FILE]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="mnist",
                   choices=["mnist", "clevr", "coco-stackgan"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--net_g", default="",
                   help="reference .pth or an output dir of our training")
    p.add_argument("--out", default="",
                   help="output path (default <variant>_g.stablehlo)")
    args = p.parse_args(argv)

    from multiple_objects_gan_tpu.models import common
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import create_state

    cfg = {"mnist": common.MNIST, "clevr": common.CLEVR,
           "coco-stackgan": common.COCO_S1}[args.variant]
    g = Stage1G(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, Stage1D(cfg), rng, batch_size=2)
    g_params, g_stats = state.g_params, state.g_stats

    if args.net_g and not os.path.exists(args.net_g):
        sys.exit(f"--net_g {args.net_g!r} not found — refusing to export "
                 "randomly initialized weights")
    if args.net_g and os.path.isfile(args.net_g):
        from multiple_objects_gan_tpu.io.torch_import import (
            import_stage1_g, load_torch_checkpoint)
        g_params, g_stats = import_stage1_g(
            load_torch_checkpoint(args.net_g), cfg)
        print(f"loaded G weights from {args.net_g}")
    elif args.net_g and os.path.isdir(args.net_g):
        from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
        mdir = os.path.join(args.net_g, "models")
        mgr = CheckpointManager(mdir if os.path.isdir(mdir) else args.net_g)
        state, _ = mgr.restore(state)
        g_params, g_stats = state.g_params, state.g_stats
        print(f"loaded G weights from {args.net_g}")

    b, o = args.batch, cfg.num_objects
    z = jnp.zeros((b, cfg.z_dim), jnp.float32)
    bbox = jnp.zeros((b, o, 4), jnp.float32)
    labels = jnp.zeros((b, o, cfg.label_dim), jnp.float32)
    text = (jnp.zeros((b, cfg.text_dim), jnp.float32)
            if cfg.use_ca else None)

    def forward(g_params, g_stats, z, bbox, labels, *text_args):
        t = text_args[0] if text_args else None
        out = g.apply({"params": g_params, "batch_stats": g_stats},
                      z, bbox, labels, t, train=False, ca_rng=None)
        return out["img"]

    from jax import export as jexport

    fn_args = (g_params, g_stats, z, bbox, labels) + (
        (text,) if cfg.use_ca else ())
    exported = jexport.export(jax.jit(forward))(*fn_args)
    blob = exported.serialize()
    out_path = args.out or f"{args.variant}_g.stablehlo"
    with open(out_path, "wb") as f:
        f.write(blob)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(g_params))
    print(f"exported {args.variant} G ({n_params/1e6:.1f}M params, "
          f"batch {b}) -> {out_path} ({len(blob)>>10} KiB, "
          f"platforms={exported.platforms})")
    # round-trip smoke: deserialize and run
    back = jexport.deserialize(blob)
    img = back.call(*fn_args)
    print(f"round-trip call OK: {img.shape} {img.dtype}")


if __name__ == "__main__":
    main()
