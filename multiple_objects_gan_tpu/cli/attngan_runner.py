"""AttnGAN training / sampling driver.

Parity target: condGANTrainer (code/coco/attngan/trainer.py):
  * train (:249-366): frozen encoders, G + 3 Ds, per-D optimizers, EMA,
    resume from the latest checkpoint incl. optimizer state (:99-107,
    150-158 — here: the whole GANTrainState restores in one piece);
  * sampling (:387-472): bulk single-image dump for FID/IS;
  * gen_example (:581-667): free-text captions -> images + attention maps.

Encoders: the reference loads pretrained DAMSM weights (cfg.TRAIN.NET_E and
the Inception download). Here NET_E may point at the published .pth (imported
via io/damsm_import); absent weights fall back to random init with a warning
(architecture and training mechanics are identical).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.parallel import mesh as pmesh
from multiple_objects_gan_tpu.utils.images import save_grid
from multiple_objects_gan_tpu.utils.logging import MetricWriter


def build_all(cfg, n_words: int):
    import dataclasses

    from multiple_objects_gan_tpu.models.attngan import (
        COCO_ATTN, DNet64, DNetScale, GNet)
    from multiple_objects_gan_tpu.nn.encoders import CNNEncoder, RNNEncoder

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
    text_enc = RNNEncoder(ntoken=n_words, nhidden=mcfg.embedding_dim)
    image_enc = CNNEncoder(nef=mcfg.embedding_dim)
    return mcfg, g, d_modules, text_enc, image_enc


def init_encoders(cfg, text_enc, image_enc, words_num: int, rng):
    """Init encoder variables; import DAMSM .pth when available."""
    caps = jnp.ones((2, words_num), jnp.int32)
    lens = jnp.full((2,), words_num, jnp.int32)
    text_vars = jax.jit(lambda r: text_enc.init(
        r, caps, lens, train=False))(rng)
    img = jnp.zeros((2, 64, 64, 3))
    image_vars = jax.jit(lambda r: image_enc.init(
        r, img, train=False))(rng)

    net_e = cfg.TRAIN.get("NET_E", "") if hasattr(cfg.TRAIN, "get") else ""
    if net_e and os.path.exists(net_e):
        from multiple_objects_gan_tpu.io.damsm_import import (
            import_text_encoder)
        text_vars = import_text_encoder(net_e, text_vars)
        img_path = net_e.replace("text_encoder", "image_encoder")
        if os.path.exists(img_path):
            from multiple_objects_gan_tpu.io.damsm_import import (
                import_image_encoder)
            image_vars = import_image_encoder(img_path, image_vars)
    else:
        print(f"WARNING: NET_E={net_e!r} not found — DAMSM encoders use "
              "random weights", flush=True)
    return {"text": text_vars, "image": image_vars}


def run(args, cfg, output_dir: str, seed: int):
    from multiple_objects_gan_tpu.data.attngan import AttnGanDataset
    from multiple_objects_gan_tpu.data.datasets import Loader
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state, make_attngan_train_step)

    ds = AttnGanDataset(
        cfg.DATA_DIR, cfg.IMG_DIR, split="train" if cfg.TRAIN.FLAG else "test",
        base_size=int(cfg.TREE.BASE_SIZE), branch_num=int(cfg.TREE.BRANCH_NUM),
        captions_per_image=int(cfg.TEXT.CAPTIONS_PER_IMAGE),
        words_num=int(cfg.TEXT.WORDS_NUM), seed=seed)
    mcfg, g, d_modules, text_enc, image_enc = build_all(cfg, ds.n_words)
    rng = jax.random.PRNGKey(seed)
    enc_vars = init_encoders(cfg, text_enc, image_enc,
                             int(cfg.TEXT.WORDS_NUM), rng)

    if not cfg.TRAIN.FLAG:
        # dispatch parity (code/coco/attngan/main.py:153-160):
        # B_VALIDATION -> quantitative dump; else free-caption gen_example
        if bool(cfg.B_VALIDATION):
            return sampling(args, cfg, ds, mcfg, g, d_modules, text_enc,
                            enc_vars, output_dir, seed)
        return run_gen_example(args, cfg, ds, mcfg, g, d_modules, text_enc,
                               enc_vars, output_dir, seed)

    smooth = {k: float(v) for k, v in cfg.TRAIN.SMOOTH.items()}
    step_fn = jax.jit(
        make_attngan_train_step(mcfg, g, d_modules, text_enc, image_enc,
                                smooth=smooth),
        donate_argnums=(0,))
    state = create_attngan_state(mcfg, g, d_modules, rng, batch_size=2,
                                 seq_len=int(cfg.TEXT.WORDS_NUM))

    ckpt = CheckpointManager(os.path.join(output_dir, "models"))
    start_epoch = 0
    if args.resume:
        prev = CheckpointManager(os.path.join(args.resume, "models"))
        if prev.latest_epoch() is not None:
            state, start_epoch = prev.restore(state)
            start_epoch += 1
            print(f"resumed from {args.resume} at epoch {start_epoch}")

    loader = Loader(ds, int(cfg.TRAIN.BATCH_SIZE), shuffle=True, seed=seed)
    mesh = pmesh.make_mesh()
    state = pmesh.replicate_state(mesh, state)
    enc_vars = jax.device_put(enc_vars, pmesh.replicated(mesh))
    writer = MetricWriter(os.path.join(output_dir, "logs"))

    lr_g = float(cfg.TRAIN.GENERATOR_LR)
    lr_d = float(cfg.TRAIN.DISCRIMINATOR_LR)
    snapshot = int(cfg.TRAIN.SNAPSHOT_INTERVAL)
    n_epochs = int(args.max_epochs if args.max_epochs is not None
                   else cfg.TRAIN.MAX_EPOCH)
    count = 0
    metrics = {}
    for epoch in range(start_epoch, n_epochs):
        t0 = time.time()
        for i, batch in enumerate(loader.epoch(epoch)):
            sharded = pmesh.shard_batch(mesh, batch)
            state, metrics = step_fn(state, enc_vars, sharded, rng,
                                     np.float32(lr_g), np.float32(lr_d))
            if i % 500 == 0:
                writer.scalars(count, {k: float(v)
                                       for k, v in metrics.items()})
            count += 1
        host = {k: float(v) for k, v in metrics.items()}
        print(f"[{epoch}/{n_epochs}] "
              + " ".join(f"{k}={v:.4f}" for k, v in sorted(host.items()))
              + f" time={time.time() - t0:.1f}s", flush=True)
        if snapshot and ((epoch + 1) % snapshot == 0
                         or epoch == n_epochs - 1):
            # checkpoints store the EMA-swapped G like the reference
            # (trainer.py:173-199); the raw G is stored too (whole state)
            ckpt.save(epoch, jax.device_get(state))
    ckpt.close()
    writer.close()
    return state


def sampling(args, cfg, ds, mcfg, g, d_modules, text_enc, enc_vars,
             output_dir: str, seed: int, num_images: int = 0):
    """Bulk single-image dump for FID/IS (trainer.py:387-472). Uses EMA G
    weights when a checkpoint is available. d_modules must match the
    training configuration so the checkpoint structure restores."""
    from multiple_objects_gan_tpu.data.datasets import Loader
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state)
    from multiple_objects_gan_tpu.utils.images import to_uint8
    from PIL import Image

    rng = jax.random.PRNGKey(seed)
    state = create_attngan_state(mcfg, g, d_modules, rng, batch_size=2,
                                 seq_len=int(cfg.TEXT.WORDS_NUM))
    net_g = cfg.TRAIN.get("NET_G", "")
    if net_g and os.path.isdir(net_g):
        mgr = CheckpointManager(os.path.join(net_g, "models"))
        if mgr.latest_epoch() is not None:
            state, _ = mgr.restore(state)
    g_params = state.g_ema if state.g_ema is not None else state.g_params

    bs = int(cfg.TRAIN.BATCH_SIZE)
    loader = Loader(ds, bs, shuffle=False, seed=seed)
    out_dir = os.path.join(output_dir, "single_samples")
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def gen(batch_caps, batch_lens, bbox, labels, z):
        words, sent = text_enc.apply(enc_vars["text"], batch_caps,
                                     batch_lens, train=False)
        out = g.apply({"params": g_params, "batch_stats": state.g_stats},
                      z, sent, words, batch_caps == 0, bbox, labels,
                      train=False, ca_rng=None)
        return out["imgs"][-1]

    written = 0
    limit = num_images or len(ds)
    for batch in loader.epoch(0):
        z = jax.random.normal(jax.random.fold_in(rng, written),
                              (bs, mcfg.z_dim))
        imgs = np.asarray(gen(jnp.asarray(batch["captions"]),
                              jnp.asarray(batch["cap_lens"]),
                              jnp.asarray(batch["bbox"]),
                              jnp.asarray(batch["label_onehot"]), z))
        for i in range(imgs.shape[0]):
            Image.fromarray(to_uint8(imgs[i])).save(
                os.path.join(out_dir, f"s_{written:06d}.png"))
            written += 1
            if written >= limit:
                break
        if written >= limit:
            break
    print(f"wrote {written} single images to {out_dir}")
    return out_dir


def gen_example(cfg, captions_text: list[str], ds, mcfg, g, text_enc,
                enc_vars, g_params, g_stats, output_dir: str, seed: int = 0):
    """Free-text captions -> images (+ attention maps), trainer.py:581-667."""
    from multiple_objects_gan_tpu.data.attngan import tokenize
    from multiple_objects_gan_tpu.utils.images import save_grid

    rng = jax.random.PRNGKey(seed)
    words_num = int(cfg.TEXT.WORDS_NUM)
    caps, lens = [], []
    for text in captions_text:
        ids = [ds.wordtoix[t] for t in tokenize(text) if t in ds.wordtoix]
        ids = ids[:words_num]
        caps.append(ids + [0] * (words_num - len(ids)))
        lens.append(max(len(ids), 1))
    caps = jnp.asarray(np.array(caps, np.int32))
    lens = jnp.asarray(np.array(lens, np.int32))
    b = caps.shape[0]
    bbox = jnp.tile(jnp.array([0.3, 0.3, 0.4, 0.4], jnp.float32),
                    (b, mcfg.num_objects, 1))
    labels = jnp.zeros((b, mcfg.num_objects, mcfg.label_dim)
                       ).at[:, :, 0].set(1.0)
    words, sent = text_enc.apply(enc_vars["text"], caps, lens, train=False)
    z = jax.random.normal(rng, (b, mcfg.z_dim))
    out = g.apply({"params": g_params, "batch_stats": g_stats},
                  z, sent, words, caps == 0, bbox, labels,
                  train=False, ca_rng=None)
    path = os.path.join(output_dir, "gen_example.png")
    save_grid(np.asarray(out["imgs"][-1]), path, nrow=4)
    print(f"wrote {path}")
    return out


def run_gen_example(args, cfg, ds, mcfg, g, d_modules, text_enc, enc_vars,
                    output_dir: str, seed: int):
    """Free-text caption generation (main.py:39-86 + trainer.gen_example).
    Captions come from <DATA_DIR>/example_captions.txt (one per line) or a
    built-in default set."""
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state)

    cap_file = os.path.join(cfg.DATA_DIR, "example_captions.txt")
    if os.path.isfile(cap_file):
        with open(cap_file) as f:
            captions = [line.strip() for line in f if line.strip()]
    else:
        captions = ["a man riding a horse on a beach",
                    "two dogs playing with a ball in a park"]
        print(f"{cap_file} not found - using built-in example captions",
              flush=True)

    rng = jax.random.PRNGKey(seed)
    state = create_attngan_state(mcfg, g, d_modules, rng, batch_size=2,
                                 seq_len=int(cfg.TEXT.WORDS_NUM))
    net_g = cfg.TRAIN.get("NET_G", "")
    if net_g and os.path.isdir(net_g):
        mgr = CheckpointManager(os.path.join(net_g, "models"))
        if mgr.latest_epoch() is not None:
            state, _ = mgr.restore(state)
    g_params = state.g_ema if state.g_ema is not None else state.g_params
    return gen_example(cfg, captions, ds, mcfg, g, text_enc, enc_vars,
                       g_params, state.g_stats, output_dir, seed)
