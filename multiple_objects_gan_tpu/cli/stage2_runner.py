"""COCO StackGAN stage-2 training/sampling driver.

Parity target: the STAGE=2 branch of code/coco/stackgan/trainer.py:110-114,
155-260: a frozen stage-1 G (loaded from cfg.STAGE1_G) feeds the stage-2 G;
D operates on 256px with stage-2-scale bboxes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.parallel import mesh as pmesh
from multiple_objects_gan_tpu.parallel.multihost import shard_loader_kwargs
from multiple_objects_gan_tpu.utils.images import save_grid
from multiple_objects_gan_tpu.utils.logging import MetricWriter


def run_stage2(args, cfg, output_dir: str, seed: int):
    from multiple_objects_gan_tpu.config.config import stage1_model_config
    from multiple_objects_gan_tpu.data.coco import CocoStackganDataset
    from multiple_objects_gan_tpu.data.datasets import Loader
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.io.torch_import import (
        maybe_load_reference_g)
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.models.stage2 import (
        COCO_S2, Stage2D, Stage2G)
    from multiple_objects_gan_tpu.train.step import (
        create_state, create_state_stage2, make_stage2_train_step)

    s1_cfg = stage1_model_config(cfg, "coco-stackgan")
    s2_cfg = COCO_S2
    import dataclasses
    s2_cfg = dataclasses.replace(
        s2_cfg, gf_dim=int(cfg.GAN.GF_DIM), df_dim=int(cfg.GAN.DF_DIM),
        condition_dim=int(cfg.GAN.CONDITION_DIM),
        d_cond_dim=int(cfg.GAN.CONDITION_DIM),
        text_dim=int(cfg.TEXT.DIMENSION))
    r_num = int(cfg.GAN.R_NUM)

    g1 = Stage1G(s1_cfg)
    g2 = Stage2G(s2_cfg, r_num=r_num)
    d2 = Stage2D(s2_cfg)

    rng = jax.random.PRNGKey(seed)
    # frozen stage-1 weights: from cfg.STAGE1_G (.pth import) or random
    s1_state = create_state(s1_cfg, g1, Stage1D(s1_cfg), rng, batch_size=2)
    loaded = maybe_load_reference_g(cfg.get("STAGE1_G", ""), s1_cfg, s1_state)
    if loaded is not None:
        s1_state = loaded
    else:
        print(f"WARNING: STAGE1_G={cfg.get('STAGE1_G', '')!r} not found — "
              "using randomly initialized stage-1 weights", flush=True)
    s1_vars = {"params": s1_state.g_params, "batch_stats": s1_state.g_stats}

    if not cfg.TRAIN.FLAG:
        if (getattr(args, "synthetic", False) and not os.path.isfile(
                os.path.join(cfg.DATA_DIR, "test", "filenames.pickle"))):
            from multiple_objects_gan_tpu.data.coco import (
                write_synthetic_coco)
            write_synthetic_coco(cfg.DATA_DIR, cfg.IMG_DIR, n=32,
                                 split="test", seed=seed)
        return sample_stage2(args, cfg, s1_cfg, s2_cfg, r_num, g1, g2, d2,
                             s1_vars, output_dir, seed)

    kl_coeff = float(cfg.TRAIN.COEFF.KL)
    step_raw = jax.jit(make_stage2_train_step(s2_cfg, s1_cfg, g1, g2, d2,
                                              kl_coeff=kl_coeff),
                       donate_argnums=(0,))
    state = create_state_stage2(s2_cfg, g2, d2, rng, batch_size=2)

    # NET_G/NET_D .pth warm-start (ref load_network_stageII,
    # code/coco/stackgan/trainer.py:117-151; NET_G also carries the
    # wrapped frozen STAGE1_G weights)
    from multiple_objects_gan_tpu.io.torch_import import (
        import_stage2_d, import_stage2_g, load_torch_checkpoint)
    net_g = cfg.get("NET_G", "")
    if net_g and str(net_g).endswith(".pth") and os.path.isfile(net_g):
        s1_imp, (p2, st2) = import_stage2_g(load_torch_checkpoint(net_g),
                                            s1_cfg, s2_cfg, r_num=r_num)
        if s1_imp is not None:
            s1_vars = {"params": {**s1_vars["params"], **s1_imp[0]},
                       "batch_stats": {**s1_vars["batch_stats"],
                                       **s1_imp[1]}}
        state = state.replace(g_params={**state.g_params, **p2},
                              g_stats={**state.g_stats, **st2})
        print(f"Load from: {net_g}", flush=True)
    net_d = cfg.get("NET_D", "")
    if net_d and str(net_d).endswith(".pth") and os.path.isfile(net_d):
        pd, std = import_stage2_d(load_torch_checkpoint(net_d))
        state = state.replace(d_params={**state.d_params, **pd},
                              d_stats={**state.d_stats, **std})
        print(f"Load from: {net_d}", flush=True)

    start_epoch = 0
    if args.resume:
        prev = CheckpointManager(os.path.join(args.resume, "models"))
        if prev.latest_epoch() is not None:
            state, start_epoch = prev.restore(state)
            start_epoch += 1
            print(f"resumed from {args.resume} at epoch {start_epoch}")

    if not os.path.isfile(os.path.join(cfg.DATA_DIR, "train",
                                       "filenames.pickle")):
        # mirror the stage-1 train path's fallback (cli/main.py): the
        # eval branch above already had one, but training on an empty
        # data dir crashed instead of honoring --synthetic
        if not getattr(args, "synthetic", False):
            import sys
            sys.exit(f"COCO data not found under {cfg.DATA_DIR} "
                     "(pass --synthetic to generate one)")
        from multiple_objects_gan_tpu.data.coco import write_synthetic_coco
        write_synthetic_coco(cfg.DATA_DIR, cfg.IMG_DIR,
                             n=max(2 * int(cfg.TRAIN.BATCH_SIZE), 64),
                             seed=seed)
    ds = CocoStackganDataset(cfg.DATA_DIR, cfg.IMG_DIR, split="train",
                             stage=2, imsize=int(cfg.IMSIZE), seed=seed)
    loader = Loader(ds, shuffle=True, seed=seed,
                    workers=int(cfg.WORKERS),
                    **shard_loader_kwargs(int(cfg.TRAIN.BATCH_SIZE)))

    mesh = pmesh.make_mesh_for_batch(loader.bs)  # LOCAL batch (contract)
    state = pmesh.replicate_state(mesh, state)
    s1_rep = jax.device_put(s1_vars, pmesh.replicated(mesh))
    writer = MetricWriter(os.path.join(output_dir, "logs"))
    ckpt = CheckpointManager(os.path.join(output_dir, "models"))
    img_dir = os.path.join(output_dir, "images")

    def step_fn(state, batch, rng, lr_g, lr_d):
        return step_raw(state, s1_rep, batch, rng, lr_g, lr_d)

    @jax.jit
    def viz_forward(s1_v, g2_v, z, bbox_s1, bbox_s2, labels, text):
        s1_out = g1.apply(s1_v, z, bbox_s1, labels, text, train=False,
                          ca_rng=None)
        out = g2.apply(g2_v, s1_out["img"], bbox_s1, bbox_s2, labels, text,
                       train=False, ca_rng=None)
        # f32 so host-side NumPy never reduces over bf16 (see
        # train/step.py:make_sample_fn)
        return out["img"].astype(jnp.float32)

    def epoch_end(state, batch, epoch):
        b = min(16, batch["image"].shape[0])
        z = jax.random.normal(jax.random.fold_in(rng, epoch),
                              (b, s1_cfg.z_dim))
        fake = viz_forward(s1_rep, {"params": state.g_params,
                                    "batch_stats": state.g_stats}, z,
                           jnp.asarray(batch["bbox"][:b]),
                           jnp.asarray(batch["bbox_s2"][:b]),
                           jnp.asarray(batch["label_onehot"][:b]),
                           jnp.asarray(batch["text_embedding"][:b]))
        save_grid(np.asarray(fake),
                  os.path.join(img_dir,
                               f"fake_samples_epoch_{epoch:03d}.png"),
                  nrow=4)
        if epoch == start_epoch:
            save_grid(batch["image"][:b],
                      os.path.join(img_dir, "real_samples.png"), nrow=4)

    from multiple_objects_gan_tpu.train.loop import run_epochs
    n_epochs = int(args.max_epochs if args.max_epochs is not None
                   else cfg.TRAIN.MAX_EPOCH)
    state, _ = run_epochs(
        loader=loader, state=state, step_fn=step_fn, mesh=mesh, rng=rng,
        lr_g=float(cfg.TRAIN.GENERATOR_LR),
        lr_d=float(cfg.TRAIN.DISCRIMINATOR_LR),
        n_epochs=n_epochs, ckpt=ckpt, writer=writer,
        start_epoch=start_epoch,
        lr_decay_epochs=int(cfg.TRAIN.LR_DECAY_EPOCH),
        snapshot_every=int(cfg.TRAIN.SNAPSHOT_INTERVAL),
        profile_dir=args.profile or None,
        epoch_end_fn=epoch_end)
    ckpt.close()
    writer.close()
    return state


def sample_stage2(args, cfg, s1_cfg, s2_cfg, r_num, g1, g2, d2, s1_vars,
                  output_dir: str, seed: int, num_samples: int = 25):
    """Qualitative 256px grids (parity: stackgan trainer.py:283-419).

    Caption/conditioning source mirrors the reference: when
    ``<DATA_DIR>/test/val_captions.t7`` exists it is read directly (pure-
    Python Torch7 reader, io/torchfile.py) together with the validation
    bbox/label pickles and ``filenames.pickle`` (trainer.py:300-307), and
    grids are saved as ``<caption>.png``; otherwise the test split's
    embedding pickles provide the same conditioning and grids are
    index-named. Composition matches trainer.py:402-417: one 10-tile row
    [real | 9 fakes], white bbox edges on every tile.

    Weight sources for NET_G:
      * reference .pth  -> io/torch_import.import_stage2_g (incl. the
        wrapped frozen STAGE1_G)
      * an output dir of our own training -> orbax restore
    """
    import dataclasses

    from multiple_objects_gan_tpu.data.coco import (
        CocoStackganDataset, labels_to_onehot)
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.io.torch_import import (
        import_stage2_g, load_torch_checkpoint)
    from multiple_objects_gan_tpu.train.step import create_state_stage2
    from multiple_objects_gan_tpu.utils.images import (
        draw_bboxes, save_grid, to_uint8)

    rng = jax.random.PRNGKey(seed)
    state = create_state_stage2(s2_cfg, g2, d2, rng, batch_size=2)
    net_g = cfg.get("NET_G", "")
    if net_g and os.path.isfile(net_g):
        ckpt = load_torch_checkpoint(net_g)
        s1_import, (p2, s2stats) = import_stage2_g(ckpt, s1_cfg, s2_cfg,
                                                   r_num=r_num)
        if s1_import is not None:
            s1_vars = {"params": {**s1_vars["params"], **s1_import[0]},
                       "batch_stats": {**s1_vars["batch_stats"],
                                       **s1_import[1]}}
        state = state.replace(g_params={**state.g_params, **p2},
                              g_stats={**state.g_stats, **s2stats})
    elif net_g and os.path.isdir(net_g):
        mgr = CheckpointManager(os.path.join(net_g, "models"))
        if mgr.latest_epoch() is not None:
            state, _ = mgr.restore(state)
    else:
        print(f"WARNING: NET_G={net_g!r} not found — sampling from random "
              "stage-2 weights", flush=True)

    imsize = int(cfg.IMSIZE)
    test_dir = os.path.join(cfg.DATA_DIR, "test")
    t7_path = os.path.join(test_dir, "val_captions.t7")
    captions_list = None
    if os.path.isfile(t7_path):
        # reference path (trainer.py:300-307): char-CNN-RNN embeddings +
        # raw captions from torch-lua, bbox/labels from the validation
        # pickles, real image from IMG_DIR/<filename>.jpg
        from PIL import Image

        from multiple_objects_gan_tpu.io.torchfile import load_val_captions

        captions_list, embeddings = load_val_captions(t7_path)
        from multiple_objects_gan_tpu.io.pycompat import load_pickle

        # load_pickle: published COCO test pickles are py2 cPickle
        val_bboxes = np.array(
            load_pickle(os.path.join(test_dir, "bboxes.pickle")), np.float32)
        val_labels = np.array(
            load_pickle(os.path.join(test_dir, "labels.pickle")))
        val_filenames = load_pickle(
            os.path.join(test_dir, "filenames.pickle"))
        n_items = len(captions_list)
        print(f"Successfully load sentences from: {test_dir}", flush=True)
        print(f"Total number of sentences: {n_items}", flush=True)

        def get_item(index):
            name = str(val_filenames[index])
            img = Image.open(os.path.join(
                cfg.IMG_DIR, f"{name}.jpg")).convert("RGB").resize(
                    (imsize, imsize), Image.LANCZOS)
            real = np.asarray(img, np.float32) / 127.5 - 1.0
            bbox = val_bboxes[index]
            return {"image": real, "bbox": bbox, "bbox_s2": bbox,
                    "label_onehot": labels_to_onehot(val_labels[index]),
                    "text_embedding": embeddings[index]}
    else:
        ds = CocoStackganDataset(cfg.DATA_DIR, cfg.IMG_DIR, split="test",
                                 stage=2, imsize=imsize, seed=seed)
        n_items = len(ds)
        get_item = ds.__getitem__

    # params enter as ARGUMENTS: baking full-width weights into the jaxpr
    # as constants overflows the tunneled backend's compile-request limit
    @jax.jit
    def gen(s1_v, g2_v, z, bbox_s1, bbox_s2, labels, text, ca_rng):
        s1_out = g1.apply(s1_v, z, bbox_s1, labels, text, train=False,
                          ca_rng=ca_rng)
        out = g2.apply(g2_v, s1_out["img"], bbox_s1, bbox_s2, labels, text,
                       train=False, ca_rng=ca_rng)
        return (s1_out["img"].astype(jnp.float32),
                out["img"].astype(jnp.float32))

    g2_vars = {"params": state.g_params, "batch_stats": state.g_stats}

    out_dir = os.path.join(output_dir, "samples")
    os.makedirs(out_dir, exist_ok=True)
    rnd = np.random.RandomState(seed)
    n_var = 9  # real + 9 fakes, one 10-tile row (trainer.py:402-404,417)
    for s in range(num_samples):
        index = int(rnd.randint(n_items))
        item = get_item(index)
        bbox_s1 = jnp.tile(jnp.asarray(item["bbox"])[None], (n_var, 1, 1))
        bbox_s2 = jnp.tile(jnp.asarray(item["bbox_s2"])[None], (n_var, 1, 1))
        labels = jnp.tile(jnp.asarray(item["label_onehot"])[None],
                          (n_var, 1, 1))
        text = jnp.tile(jnp.asarray(item["text_embedding"])[None],
                        (n_var, 1))
        z = jax.random.normal(jax.random.fold_in(rng, s),
                              (n_var, s1_cfg.z_dim))
        # --stochastic_ca: fresh CA noise at eval like the reference
        # (model.py:66-71); default keeps the deterministic c = mu path
        ca_rng = (jax.random.fold_in(rng, 10_000 + s)
                  if getattr(args, "stochastic_ca", False) else None)
        _, fakes = gen(s1_vars, g2_vars, z, bbox_s1, bbox_s2, labels, text,
                       ca_rng)
        # white bbox edges on ALL tiles, real included (trainer.py:406-415)
        tiles = [draw_bboxes(to_uint8(item["image"]), item["bbox_s2"])]
        tiles += [draw_bboxes(to_uint8(f), item["bbox_s2"])
                  for f in np.asarray(fakes)]
        grid = np.stack([t / 127.5 - 1.0 for t in tiles])
        if captions_list is not None:
            stem = "".join(c if c.isalnum() or c in " _-" else "_"
                           for c in captions_list[index]).strip() or "sample"
            name = f"{stem}.png"  # caption filename (trainer.py:417)
        else:
            name = f"sample_{s:03d}.png"
        save_grid(grid, os.path.join(out_dir, name), nrow=10)
    print(f"wrote {num_samples} stage-2 sample grids to {out_dir}")
    return out_dir
