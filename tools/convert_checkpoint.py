"""Convert published reference .pth checkpoints to orbax — once, offline.

Every eval CLI already imports .pth directly (io/torch_import.py), but
that needs torch importable at serving time to unpickle. This tool does
the conversion once; the resulting directory drops into any place a
NET_G dir is accepted (cli/sample.py, cli/attngan_runner.py:restore_g),
so production serving is torch-free.

  python tools/convert_checkpoint.py stage1 --variant multi-mnist \
      --cfg cfg/mnist_eval.yml --net_g model.pth [--net_d d.pth] --out DIR
  python tools/convert_checkpoint.py attngan --cfg cfg/coco_attn_eval.yml \
      --net_g coco_AttnGAN2.pth --out DIR

Writes DIR/models/<0>/ (orbax). Stage-2 .pth files embed the wrapped
frozen STAGE1_G (ref trainer.py:117-151) which the stage-2 orbax state
does not carry — keep using the direct .pth import there, or convert the
standalone STAGE1_G checkpoint with `stage1 --variant coco-stackgan`.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def convert_stage1(args) -> None:
    from multiple_objects_gan_tpu.config.config import (
        cfg_from_file, stage1_model_config)
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.io.torch_import import (
        maybe_load_reference_d, maybe_load_reference_g)
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import create_state

    import dataclasses

    cfg = cfg_from_file(args.cfg, args.variant)
    mcfg = stage1_model_config(cfg, args.variant)
    if args.gf_dim:
        mcfg = dataclasses.replace(mcfg, gf_dim=args.gf_dim)
    if args.df_dim:
        mcfg = dataclasses.replace(mcfg, df_dim=args.df_dim)
    g, d = Stage1G(mcfg), Stage1D(mcfg)
    state = create_state(mcfg, g, d, jax.random.PRNGKey(0), batch_size=2)
    loaded = maybe_load_reference_g(args.net_g, mcfg, state)
    if loaded is None:
        sys.exit(f"NET_G {args.net_g!r} not found")
    state = loaded
    print(f"imported G from {args.net_g}")
    if args.net_d:
        loaded = maybe_load_reference_d(args.net_d, mcfg, state)
        if loaded is None:
            sys.exit(f"NET_D {args.net_d!r} not found")
        state = loaded
        print(f"imported D from {args.net_d}")
    mgr = CheckpointManager(os.path.join(args.out, "models"))
    mgr.save(0, state, wait=True)
    print(f"wrote orbax checkpoint to {args.out}/models")


def convert_attngan(args) -> None:
    import dataclasses

    from multiple_objects_gan_tpu.config.config import cfg_from_file
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.io.torch_import import (
        import_attngan_g, load_torch_checkpoint)
    from multiple_objects_gan_tpu.models.attngan import (
        COCO_ATTN, DNet64, DNetScale, GNet)
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state)

    cfg = cfg_from_file(args.cfg, "coco-attngan")
    # mirror cli/attngan_runner's mcfg construction exactly
    mcfg = dataclasses.replace(
        COCO_ATTN, gf_dim=int(cfg.GAN.GF_DIM), df_dim=int(cfg.GAN.DF_DIM),
        z_dim=int(cfg.GAN.Z_DIM), condition_dim=int(cfg.GAN.CONDITION_DIM),
        embedding_dim=int(cfg.TEXT.EMBEDDING_DIM),
        branch_num=int(cfg.TREE.BRANCH_NUM), r_num=int(cfg.GAN.R_NUM),
        b_dcgan=bool(cfg.GAN.B_DCGAN))
    g = GNet(mcfg)
    d_modules = {}
    if mcfg.branch_num > 0:
        d_modules["d64"] = DNet64(mcfg)
    if mcfg.branch_num > 1:
        d_modules["d128"] = DNetScale(mcfg, scale=128)
    if mcfg.branch_num > 2:
        d_modules["d256"] = DNetScale(mcfg, scale=256)
    state = create_attngan_state(mcfg, g, d_modules, jax.random.PRNGKey(0),
                                 batch_size=2,
                                 seq_len=int(cfg.TEXT.WORDS_NUM))
    params, stats = import_attngan_g(load_torch_checkpoint(args.net_g),
                                     branch_num=mcfg.branch_num,
                                     r_num=mcfg.r_num)
    state = state.replace(g_params={**state.g_params, **params},
                          g_stats={**state.g_stats, **stats})
    # restore_g prefers EMA when restoring orbax; the published .pth IS
    # the EMA-swapped checkpoint, so mirror it there too
    if state.g_ema is not None:
        state = state.replace(g_ema={**state.g_ema, **params})
    print(f"imported G from {args.net_g}")
    mgr = CheckpointManager(os.path.join(args.out, "models"))
    mgr.save(0, state, wait=True)
    print(f"wrote orbax checkpoint to {args.out}/models")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("family", choices=["stage1", "attngan"])
    p.add_argument("--variant", default="multi-mnist",
                   choices=["multi-mnist", "clevr", "coco-stackgan"])
    p.add_argument("--cfg", required=True)
    p.add_argument("--net_g", required=True)
    p.add_argument("--net_d", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--gf_dim", type=int, default=0,
                   help="override GAN.GF_DIM (non-published widths)")
    p.add_argument("--df_dim", type=int, default=0,
                   help="override GAN.DF_DIM (non-published widths)")
    args = p.parse_args(argv)
    if args.family == "stage1":
        convert_stage1(args)
    else:
        convert_attngan(args)


if __name__ == "__main__":
    main()
