"""DAMSM encoder pretraining driver (`--variant damsm`).

Capability BEYOND the reference: tohinz/multiple-objects-gan ships no
DAMSM pretraining — its README (README.md:33-35) tells users to download
the pretrained model from upstream AttnGAN and drop it into
`code/coco/attngan/DAMSMencoders/`. This driver produces those encoders
in-framework (train/damsm_step.py, modeled on upstream AttnGAN's
pretrain_DAMSM.py) and exports them in BOTH formats:

  * `models/` — orbax DAMSMTrainState (full resume incl. Adam moments);
  * `DAMSMencoders/text_encoder{E}.pth` + `image_encoder{E}.pth` — the
    reference's torch format (io/damsm_export), so cfg.TRAIN.NET_E in any
    attngan run (ours or the PyTorch reference) can point straight at
    them.

Schedule parity with upstream pretrain_DAMSM.py: Adam(ENCODER_LR,
betas=(0.5, 0.999)) over RNN + CNN projection heads, RNN grad clip
RNN_GRAD_CLIP, lr x0.98 per epoch floored at ENCODER_LR/10, per-epoch
eval-split loss. Backbone warm-start: $INCEPTION_V3_WEIGHTS (a full
torchvision inception_v3 state_dict; AuxLogits/fc dropped) replicates
upstream's ImageNet-pretrained frozen backbone; without it the backbone
is random (documented — fine for pipeline validation, not for publishable
encoders).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.parallel import mesh as pmesh
from multiple_objects_gan_tpu.parallel.multihost import shard_loader_kwargs
from multiple_objects_gan_tpu.utils.logging import MetricWriter


def damsm_lr(base_lr: float, epoch: int) -> float:
    """Upstream pretrain_DAMSM.py schedule: lr x0.98 per epoch until it
    reaches ENCODER_LR / 10, then flat."""
    return max(base_lr * (0.98 ** epoch), base_lr / 10.0)


def run_damsm(args, cfg, output_dir: str, seed: int):
    from multiple_objects_gan_tpu.data.attngan import AttnGanDataset
    from multiple_objects_gan_tpu.data.datasets import Loader
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.io.damsm_export import (
        export_image_encoder, export_text_encoder)
    from multiple_objects_gan_tpu.nn.encoders import CNNEncoder, RNNEncoder
    from multiple_objects_gan_tpu.train.damsm_step import (
        create_damsm_state, make_damsm_eval_fn, make_damsm_train_step)
    from multiple_objects_gan_tpu.train.loop import run_epochs

    words_num = int(cfg.TEXT.WORDS_NUM)
    emb = int(cfg.TEXT.EMBEDDING_DIM)
    imsize = int(cfg.TREE.BASE_SIZE) * (2 ** (int(cfg.TREE.BRANCH_NUM) - 1))
    ds = AttnGanDataset(
        cfg.DATA_DIR, cfg.IMG_DIR, split="train",
        base_size=int(cfg.TREE.BASE_SIZE),
        branch_num=int(cfg.TREE.BRANCH_NUM),
        captions_per_image=int(cfg.TEXT.CAPTIONS_PER_IMAGE),
        words_num=words_num, seed=seed)
    text_enc = RNNEncoder(ntoken=ds.n_words, nhidden=emb)
    image_enc = CNNEncoder(nef=emb)
    rng = jax.random.PRNGKey(seed)

    # init (jitted — tunneled-TPU RPC latency) then optional warm starts
    caps0 = jnp.ones((2, words_num), jnp.int32)
    lens0 = jnp.full((2,), words_num, jnp.int32)
    text_vars = jax.jit(lambda r: text_enc.init(
        r, caps0, lens0, train=False))(rng)
    img0 = jnp.zeros((2, imsize, imsize, 3))
    image_vars = jax.jit(lambda r: image_enc.init(
        r, img0, train=False))(rng)

    backbone = os.environ.get("INCEPTION_V3_WEIGHTS", "")
    if backbone and os.path.exists(backbone):
        from multiple_objects_gan_tpu.io.damsm_import import (
            import_image_encoder)
        image_vars = import_image_encoder(
            backbone, image_vars, skip_prefixes=("AuxLogits.", "fc."))
        print(f"Load Inception backbone from: {backbone}", flush=True)
    net_e = cfg.TRAIN.get("NET_E", "")
    if net_e and os.path.exists(net_e):
        # warm-start from existing DAMSM encoders (continue pretraining)
        from multiple_objects_gan_tpu.io.damsm_import import (
            import_image_encoder, import_text_encoder)
        text_vars = import_text_encoder(net_e, text_vars)
        print(f"Load text encoder from: {net_e}", flush=True)
        img_path = net_e.replace("text_encoder", "image_encoder")
        if os.path.exists(img_path):
            image_vars = import_image_encoder(img_path, image_vars)
            print(f"Load image encoder from: {img_path}", flush=True)
    elif not backbone:
        print("WARNING: $INCEPTION_V3_WEIGHTS unset and no NET_E — the "
              "frozen Inception backbone is RANDOM; encoders will train "
              "but are not comparable to the published DAMSM", flush=True)

    state = create_damsm_state(text_enc, image_enc, rng,
                               seq_len=words_num, image_size=imsize,
                               image_vars=image_vars, text_vars=text_vars)

    smooth = {k: float(v) for k, v in cfg.TRAIN.SMOOTH.items()}
    step_raw = jax.jit(
        make_damsm_train_step(text_enc, image_enc, smooth=smooth,
                              grad_clip=float(cfg.TRAIN.RNN_GRAD_CLIP)),
        donate_argnums=(0,))

    ckpt = CheckpointManager(os.path.join(output_dir, "models"))
    start_epoch = 0
    if args.resume:
        prev = CheckpointManager(os.path.join(args.resume, "models"))
        if prev.latest_epoch() is not None:
            state, start_epoch = prev.restore(state)
            start_epoch += 1
            print(f"resumed from {args.resume} at epoch {start_epoch}")

    loader = Loader(ds, shuffle=True, seed=seed,
                    workers=int(cfg.WORKERS),
                    **shard_loader_kwargs(int(cfg.TRAIN.BATCH_SIZE)))
    mesh = pmesh.make_mesh_for_batch(loader.bs)  # LOCAL batch (contract)
    state = pmesh.replicate_state(mesh, state)
    writer = MetricWriter(os.path.join(output_dir, "logs"))
    enc_dir = os.path.join(output_dir, "DAMSMencoders")
    os.makedirs(enc_dir, exist_ok=True)

    def step_fn(state, batch, rng, lr_g, lr_d):
        return step_raw(state, batch, rng, lr_g)

    base_lr = float(cfg.TRAIN.ENCODER_LR)

    def lr_fn(epoch):
        lr = damsm_lr(base_lr, epoch)
        return lr, lr

    eval_loader = None
    test_dir = os.path.join(cfg.DATA_DIR, "test")
    if os.path.isfile(os.path.join(test_dir, "filenames.pickle")):
        eval_ds = AttnGanDataset(
            cfg.DATA_DIR, cfg.IMG_DIR, split="test",
            base_size=int(cfg.TREE.BASE_SIZE),
            branch_num=int(cfg.TREE.BRANCH_NUM),
            captions_per_image=int(cfg.TEXT.CAPTIONS_PER_IMAGE),
            words_num=words_num, seed=seed)
        if len(eval_ds) >= int(cfg.TRAIN.BATCH_SIZE):
            eval_loader = Loader(eval_ds, int(cfg.TRAIN.BATCH_SIZE),
                                 shuffle=False, seed=seed,
                                 workers=int(cfg.WORKERS))
    eval_raw = jax.jit(make_damsm_eval_fn(text_enc, image_enc,
                                          smooth=smooth))

    snapshot_every = int(cfg.TRAIN.SNAPSHOT_INTERVAL)
    n_epochs = int(args.max_epochs if args.max_epochs is not None
                   else cfg.TRAIN.MAX_EPOCH)

    def epoch_end(state, batch, epoch):
        if eval_loader is not None:
            totals: dict = {}
            n = 0
            for b in eval_loader.epoch(0):
                m = eval_raw(state, pmesh.shard_batch(mesh, b))
                for k, v in m.items():
                    totals[k] = totals.get(k, 0.0) + float(v)
                n += 1
            if n:
                host = {f"eval_{k}": v / n for k, v in totals.items()}
                writer.scalars(epoch, host)
                print("  eval: " + " ".join(f"{k}={v:.4f}"
                                            for k, v in sorted(host.items())),
                      flush=True)
        if (snapshot_every and (epoch + 1) % snapshot_every == 0) \
                or epoch == n_epochs - 1:
            host_state = jax.device_get(state)
            export_text_encoder({"params": host_state.text_params},
                                os.path.join(enc_dir,
                                             f"text_encoder{epoch}.pth"))
            export_image_encoder(
                {"params": host_state.image_params,
                 "batch_stats": host_state.image_stats},
                os.path.join(enc_dir, f"image_encoder{epoch}.pth"))
            print(f"saved DAMSM .pth encoders (epoch {epoch}) to {enc_dir}",
                  flush=True)

    state, _ = run_epochs(
        loader=loader, state=state, step_fn=step_fn, mesh=mesh, rng=rng,
        lr_g=base_lr, lr_d=base_lr, n_epochs=n_epochs, ckpt=ckpt,
        writer=writer, start_epoch=start_epoch, lr_decay_epochs=0,
        snapshot_every=snapshot_every, profile_dir=args.profile or None,
        epoch_end_fn=epoch_end, lr_fn=lr_fn)
    ckpt.close()
    writer.close()
    return state
