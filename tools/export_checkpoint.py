"""Export orbax checkpoints trained in THIS framework to reference .pth.

The inverse of tools/convert_checkpoint.py: models trained here become
checkpoints the PyTorch reference loads directly — NET_G as
``{'netG': state_dict}`` / NET_D as a bare state_dict
(load_network_stageI, code/multi-mnist/trainer.py:59-68; attngan eval
loads ``state_dict['netG']``, trainer.py:497-504; pass --bare for the
attngan TRAIN.NET_G warm-start path which expects a bare dict,
trainer.py:110-113).

  python tools/export_checkpoint.py stage1 --variant multi-mnist \
      --cfg cfg/mnist_eval.yml --ckpt OUTPUT_DIR [--epoch N] \
      --out netG.pth [--out_d netD.pth]
  python tools/export_checkpoint.py stage2 --cfg cfg/coco_s2_eval.yml \
      --ckpt OUTPUT_DIR --s1_net_g stage1_netG.pth --out netG.pth
  python tools/export_checkpoint.py attngan --cfg cfg/coco_attn_eval.yml \
      --ckpt OUTPUT_DIR --out netG.pth [--raw] [--bare]

--ckpt accepts a training output dir (containing models/) or the models/
dir itself. attngan exports the EMA copy of G by default — the
reference's published checkpoints are EMA-swapped (trainer.py:173-199);
--raw exports the live weights instead. Stage-2 .pth files must embed the
wrapped frozen STAGE1_G for a strict reference load; supply it with
--s1_net_g (a stage-1 .pth, from the reference or from this exporter).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _models_dir(path: str) -> str:
    sub = os.path.join(path, "models")
    return sub if os.path.isdir(sub) else path


def _save_bare(sd: dict, path: str) -> None:
    from multiple_objects_gan_tpu.io.torch_export import save_bare_state_dict
    save_bare_state_dict(sd, path)


def export_stage1(args) -> None:
    from multiple_objects_gan_tpu.config.config import (
        cfg_from_file, stage1_model_config)
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.io.torch_export import (
        export_stage1_d, export_stage1_g, save_reference_checkpoint)
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import create_state

    cfg = cfg_from_file(args.cfg, args.variant)
    mcfg = stage1_model_config(cfg, args.variant)
    state = create_state(mcfg, Stage1G(mcfg), Stage1D(mcfg),
                         jax.random.PRNGKey(0), batch_size=2)
    mgr = CheckpointManager(_models_dir(args.ckpt))
    state, epoch = mgr.restore(state, epoch=args.epoch)
    save_reference_checkpoint(
        args.out, epoch,
        net_g=export_stage1_g(state.g_params, state.g_stats, mcfg))
    print(f"wrote netG (epoch {epoch}) to {args.out}")
    if args.out_d:
        _save_bare(export_stage1_d(state.d_params, state.d_stats),
                   args.out_d)
        print(f"wrote bare netD to {args.out_d}")


def export_stage2(args) -> None:
    from multiple_objects_gan_tpu.config.config import (
        cfg_from_file, stage1_model_config)
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.io.torch_export import (
        export_stage2_d, export_stage2_g, save_reference_checkpoint)
    from multiple_objects_gan_tpu.io.torch_import import (
        import_stage1_g, load_torch_checkpoint)
    from multiple_objects_gan_tpu.models.stage2 import (
        COCO_S2, Stage2D, Stage2G)
    from multiple_objects_gan_tpu.train.step import create_state_stage2

    cfg = cfg_from_file(args.cfg, "coco-stackgan")
    s1_cfg = stage1_model_config(cfg, "coco-stackgan")
    s2_cfg = dataclasses.replace(
        COCO_S2, gf_dim=int(cfg.GAN.GF_DIM), df_dim=int(cfg.GAN.DF_DIM),
        condition_dim=int(cfg.GAN.CONDITION_DIM),
        d_cond_dim=int(cfg.GAN.CONDITION_DIM))
    r_num = int(cfg.GAN.R_NUM)
    state = create_state_stage2(s2_cfg, Stage2G(s2_cfg, r_num=r_num),
                                Stage2D(s2_cfg), jax.random.PRNGKey(0),
                                batch_size=2)
    mgr = CheckpointManager(_models_dir(args.ckpt))
    state, epoch = mgr.restore(state, epoch=args.epoch)

    s1_params = s1_stats = None
    if args.s1_net_g:
        s1_params, s1_stats = import_stage1_g(
            load_torch_checkpoint(args.s1_net_g), s1_cfg)
        print(f"embedding STAGE1_G from {args.s1_net_g}")
    else:
        print("WARNING: no --s1_net_g — the reference's STAGE2_G wraps a "
              "frozen STAGE1_G (model.py:317-320) and a strict torch load "
              "of this export will report its keys missing")
    save_reference_checkpoint(
        args.out, epoch,
        net_g=export_stage2_g(s1_params, s1_stats, state.g_params,
                              state.g_stats, s1_cfg, r_num=r_num))
    print(f"wrote netG (epoch {epoch}) to {args.out}")
    if args.out_d:
        _save_bare(export_stage2_d(state.d_params, state.d_stats),
                   args.out_d)
        print(f"wrote bare netD to {args.out_d}")


def export_attngan(args) -> None:
    from multiple_objects_gan_tpu.config.config import cfg_from_file
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.io.torch_export import (
        export_attngan_g, save_reference_checkpoint)
    from multiple_objects_gan_tpu.models.attngan import (
        COCO_ATTN, DNet64, DNetScale, GNet)
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state)

    cfg = cfg_from_file(args.cfg, "coco-attngan")
    mcfg = dataclasses.replace(
        COCO_ATTN, gf_dim=int(cfg.GAN.GF_DIM), df_dim=int(cfg.GAN.DF_DIM),
        z_dim=int(cfg.GAN.Z_DIM), condition_dim=int(cfg.GAN.CONDITION_DIM),
        embedding_dim=int(cfg.TEXT.EMBEDDING_DIM),
        branch_num=int(cfg.TREE.BRANCH_NUM), r_num=int(cfg.GAN.R_NUM),
        b_dcgan=bool(cfg.GAN.B_DCGAN))
    d_modules = {}
    if mcfg.branch_num > 0:
        d_modules["d64"] = DNet64(mcfg)
    if mcfg.branch_num > 1:
        d_modules["d128"] = DNetScale(mcfg, scale=128)
    if mcfg.branch_num > 2:
        d_modules["d256"] = DNetScale(mcfg, scale=256)
    state = create_attngan_state(mcfg, GNet(mcfg), d_modules,
                                 jax.random.PRNGKey(0), batch_size=2,
                                 seq_len=int(cfg.TEXT.WORDS_NUM))
    mgr = CheckpointManager(_models_dir(args.ckpt))
    state, epoch = mgr.restore(state, epoch=args.epoch)
    g_params = state.g_params if args.raw else (state.g_ema or state.g_params)
    sd = export_attngan_g(g_params, state.g_stats,
                          branch_num=mcfg.branch_num, r_num=mcfg.r_num)
    if args.bare:  # attngan TRAIN.NET_G warm-start format (trainer.py:110-113)
        _save_bare(sd, args.out)
    else:          # eval format: state_dict['netG'] (trainer.py:497-504)
        save_reference_checkpoint(args.out, epoch, net_g=sd)
    print(f"wrote {'raw' if args.raw else 'EMA'} netG (epoch {epoch}, "
          f"{'bare' if args.bare else 'netG container'}) to {args.out}")
    if args.out_d:  # netD%d.pth next to NET_G (trainer.py:119-126)
        from multiple_objects_gan_tpu.io.torch_export import export_attngan_d
        os.makedirs(args.out_d, exist_ok=True)
        for i, name in enumerate(sorted(state.d_params,
                                        key=lambda n: int(n[1:]))):
            path = os.path.join(args.out_d, f"netD{i}.pth")
            _save_bare(export_attngan_d(state.d_params[name],
                                        state.d_stats[name],
                                        scale=int(name[1:])), path)
            print(f"wrote bare {name} to {path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("family", choices=["stage1", "stage2", "attngan"])
    p.add_argument("--variant", default="multi-mnist",
                   choices=["multi-mnist", "clevr", "coco-stackgan"])
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", required=True,
                   help="training output dir (or its models/ subdir)")
    p.add_argument("--epoch", type=int, default=None,
                   help="checkpoint epoch (default: latest)")
    p.add_argument("--out", required=True, help="output netG .pth path")
    p.add_argument("--out_d", default="",
                   help="stage1/stage2: path for a bare netD .pth; "
                        "attngan: directory for netD0/1/2.pth")
    p.add_argument("--s1_net_g", default="",
                   help="stage2: stage-1 netG .pth to embed as STAGE1_G.*")
    p.add_argument("--raw", action="store_true",
                   help="attngan: export live G weights instead of EMA")
    p.add_argument("--bare", action="store_true",
                   help="attngan: bare state_dict (TRAIN.NET_G warm-start "
                        "format) instead of the {'netG': ...} container")
    args = p.parse_args(argv)
    if args.family == "stage1":
        export_stage1(args)
    elif args.family == "stage2":
        export_stage2(args)
    else:
        export_attngan(args)


if __name__ == "__main__":
    main()
