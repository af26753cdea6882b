"""COCO StackGAN stage-2 training/sampling driver.

Parity target: the STAGE=2 branch of code/coco/stackgan/trainer.py:110-114,
155-260: a frozen stage-1 G (loaded from cfg.STAGE1_G) feeds the stage-2 G;
D operates on 256px with stage-2-scale bboxes.
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
        d_cond_dim=int(cfg.GAN.CONDITION_DIM))
    r_num = int(cfg.GAN.get("R_NUM", 2)) if hasattr(cfg.GAN, "get") else 2

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
        raise NotImplementedError(
            "stage-2 sampling path: use sample.sh coco-stackgan-2 after "
            "training; quantitative eval arrives with the eval harness")

    kl_coeff = float(cfg.TRAIN.COEFF.KL)
    step_fn = jax.jit(make_stage2_train_step(s2_cfg, s1_cfg, g1, g2, d2,
                                             kl_coeff=kl_coeff),
                      donate_argnums=(0,))
    state = create_state_stage2(s2_cfg, g2, d2, rng, batch_size=2)

    ds = CocoStackganDataset(cfg.DATA_DIR, cfg.IMG_DIR, split="train",
                             stage=2, imsize=int(cfg.IMSIZE), seed=seed)
    loader = Loader(ds, int(cfg.TRAIN.BATCH_SIZE), shuffle=True, seed=seed)

    mesh = pmesh.make_mesh()
    state = pmesh.replicate_state(mesh, state)
    s1_vars = jax.device_put(s1_vars, pmesh.replicated(mesh))
    writer = MetricWriter(os.path.join(output_dir, "logs"))
    ckpt = CheckpointManager(os.path.join(output_dir, "models"))

    lr_g = float(cfg.TRAIN.GENERATOR_LR)
    lr_d = float(cfg.TRAIN.DISCRIMINATOR_LR)
    lr_decay = int(cfg.TRAIN.LR_DECAY_EPOCH)
    snapshot = int(cfg.TRAIN.SNAPSHOT_INTERVAL)
    n_epochs = int(args.max_epochs if args.max_epochs is not None
                   else cfg.TRAIN.MAX_EPOCH)
    count = 0
    metrics = {}
    for epoch in range(n_epochs):
        t0 = time.time()
        if epoch % lr_decay == 0 and epoch > 0:
            lr_g *= 0.5
            lr_d *= 0.5
        for i, batch in enumerate(loader.epoch(epoch)):
            sharded = pmesh.shard_batch(mesh, batch)
            state, metrics = step_fn(state, s1_vars, sharded, rng,
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
            ckpt.save(epoch, jax.device_get(state))
    ckpt.close()
    writer.close()
    return state
