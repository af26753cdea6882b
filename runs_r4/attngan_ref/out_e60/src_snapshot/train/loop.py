"""Epoch-based train loop: LR halving, logging, snapshots, image grids.

Parity target: GANTrainer.train (code/multi-mnist/trainer.py:75-206):
  * Adam(lr=2e-4, betas=(0.5, 0.999)) for G and D;
  * LR halved when ``epoch % LR_DECAY_EPOCH == 0 and epoch > 0``;
  * scalar logs every 500 steps (D_loss{,_real,_wrong,_fake}, G_loss
    [, KL_loss]); stdout epoch summary with wall time;
  * fake-image grid per epoch; snapshot every SNAPSHOT_INTERVAL epochs
    (rotation keep-5).

The shared epoch skeleton (:func:`run_epochs`) also drives the AttnGAN
trainer (cli/attngan_runner.py), which has no LR decay
(code/coco/attngan/trainer.py never touches the LR) but adds a periodic
step hook for attention montages (trainer.py:345-353).

TPU-first: one fused jitted step; host only feeds sharded batches and
pulls scalars at logging points (avoiding per-step device->host syncs).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
from multiple_objects_gan_tpu.parallel import mesh as pmesh
from multiple_objects_gan_tpu.utils.images import save_grid
from multiple_objects_gan_tpu.utils.logging import MetricWriter


def run_epochs(*, loader, state, step_fn, mesh, rng,
               lr_g: float, lr_d: float, n_epochs: int,
               ckpt: CheckpointManager, writer: MetricWriter,
               start_epoch: int = 0, lr_decay_epochs: int = 0,
               snapshot_every: int = 0, log_every: int = 500,
               profile_dir: Optional[str] = None,
               epoch_end_fn: Optional[Callable] = None,
               step_hook: Optional[Callable] = None,
               step_hook_every: int = 0,
               lr_fn: Optional[Callable] = None):
    """Shared epoch/step skeleton for every trainer variant.

    ``step_fn(state, sharded_batch, rng, lr_g, lr_d) -> (state, metrics)``
    must already be jitted. ``epoch_end_fn(state, last_batch, epoch)`` runs
    after each epoch (image grids); ``step_hook(state, batch, count)`` runs
    every ``step_hook_every`` global steps (attention montages).
    ``lr_fn(epoch) -> (lr_g, lr_d)`` overrides both LRs per epoch (DAMSM
    pretraining's x0.98 decay); mutually exclusive with lr_decay_epochs.
    Returns (state, last_metrics).
    """
    if len(loader) == 0:
        raise ValueError(
            f"empty loader: dataset has {len(loader.ds)} items but the "
            f"drop-last batch size is {loader.bs} — no training would run")
    count = 0
    metrics: dict = {}
    # multi-host: process 0 owns logging; orbax saves stay collective
    # (every process must participate). Image hooks (epoch grids,
    # attention montages) run only on SINGLE-process jobs: they invoke
    # jits that close over global-mesh arrays (encoder vars, frozen
    # stage-1 vars), and a jit over a multi-process device assignment
    # enqueued by one process alone deadlocks. Multi-host runs still
    # checkpoint every epoch — render grids offline from those.
    main_proc = jax.process_index() == 0
    hooks_on = main_proc and jax.process_count() == 1
    base_lr_g, base_lr_d = lr_g, lr_d
    tracing = False

    for epoch in range(start_epoch, n_epochs):
        t0 = time.time()
        # LR halving (code/multi-mnist/trainer.py:105-111), computed
        # FUNCTIONALLY from the epoch index so a resumed run lands on the
        # schedule a fresh run would be at (a stateful `lr *= 0.5` would
        # skip every halving before start_epoch). attngan passes
        # lr_decay_epochs=0 (its reference trainer never decays).
        if lr_decay_epochs:
            f = 0.5 ** (epoch // lr_decay_epochs)
            lr_g, lr_d = base_lr_g * f, base_lr_d * f
        if lr_fn is not None:
            lr_g, lr_d = lr_fn(epoch)
        last_batch = None
        for i, batch in enumerate(loader.epoch(epoch)):
            # profiling hooks (reference has none — SURVEY.md §5): trace a
            # few post-warmup steps so the XLA timeline is inspectable
            if profile_dir and epoch == start_epoch and i == 2:
                jax.profiler.start_trace(profile_dir)
                tracing = True
            sharded = pmesh.shard_batch(mesh, batch)
            state, metrics = step_fn(state, sharded, rng,
                                     np.float32(lr_g), np.float32(lr_d))
            if tracing and i == 5:
                jax.block_until_ready(state)
                jax.profiler.stop_trace()
                tracing = False
                print(f"profiler trace written to {profile_dir}", flush=True)
            if i % log_every == 0 and main_proc:
                host = {k: float(v) for k, v in metrics.items()}
                writer.scalars(count, host)
            if (step_hook is not None and step_hook_every
                    and count % step_hook_every == 0 and hooks_on):
                step_hook(state, batch, count)
            count += 1
            last_batch = batch
        if tracing:  # first epoch had < 6 batches: finalize the trace
            jax.block_until_ready(state)
            jax.profiler.stop_trace()
            tracing = False
            print(f"profiler trace written to {profile_dir}", flush=True)
        dt = time.time() - t0
        if main_proc:
            host = {k: float(v) for k, v in metrics.items()}
            print(f"[{epoch}/{n_epochs}] "
                  + " ".join(f"{k}={v:.4f}" for k, v in sorted(host.items()))
                  + f" time={dt:.1f}s", flush=True)
        if epoch_end_fn is not None and last_batch is not None and hooks_on:
            epoch_end_fn(state, last_batch, epoch)
        if snapshot_every and ((epoch + 1) % snapshot_every == 0
                               or epoch == n_epochs - 1):
            ckpt.save(epoch, jax.device_get(state))
    return state, metrics


def train(cfg_yaml, model_cfg, g_module, d_module, loader,
          output_dir: str, *, state=None, train_step: Optional[Callable] = None,
          make_train_step_fn: Optional[Callable] = None,
          sample_fn: Optional[Callable] = None,
          mesh=None, seed: int = 0, log_every: int = 500,
          max_epochs: Optional[int] = None,
          profile_dir: Optional[str] = None,
          resume_dir: Optional[str] = None):
    """Run the full stage-1/stage-2 training. Returns the final state."""
    from multiple_objects_gan_tpu.train.step import (
        create_state, make_sample_fn, make_train_step)

    os.makedirs(output_dir, exist_ok=True)
    img_dir = os.path.join(output_dir, "images")
    model_dir = os.path.join(output_dir, "models")
    writer = MetricWriter(os.path.join(output_dir, "logs"))

    rng = jax.random.PRNGKey(seed)
    if mesh is None:
        mesh = pmesh.make_mesh_for_batch(loader.bs)
    if state is None:
        state = create_state(model_cfg, g_module, d_module, rng,
                             batch_size=2)
        # NET_G/NET_D .pth warm-start (reference load_network_stageI,
        # code/multi-mnist/trainer.py:59-68)
        from multiple_objects_gan_tpu.io.torch_import import (
            maybe_load_reference_d, maybe_load_reference_g)
        for key, loader_fn in (("NET_G", maybe_load_reference_g),
                               ("NET_D", maybe_load_reference_d)):
            path = cfg_yaml.get(key, "") if hasattr(cfg_yaml, "get") else ""
            if path and str(path).endswith(".pth"):
                loaded = loader_fn(path, model_cfg, state)
                if loaded is not None:
                    state = loaded
                    print(f"Load from: {path}", flush=True)
    if train_step is None:
        kl_coeff = 2.0
        try:
            kl_coeff = float(cfg_yaml.TRAIN.COEFF.KL)
        except (AttributeError, KeyError):
            pass
        train_step = make_train_step(model_cfg, g_module, d_module,
                                     kl_coeff=kl_coeff)
    step_fn = pmesh.jit_train_step(train_step)
    if sample_fn is None:
        sample_fn = make_sample_fn(model_cfg, g_module)

    # resume: restore the full state (params, optimizers, BN stats, step) —
    # a superset of the reference's attngan resume (trainer.py:99-107)
    start_epoch = 0
    if resume_dir:
        prev = CheckpointManager(os.path.join(resume_dir, "models"))
        if prev.latest_epoch() is not None:
            state, last = prev.restore(state)
            start_epoch = last + 1
            print(f"resumed from {resume_dir} at epoch {start_epoch}",
                  flush=True)

    state = pmesh.replicate_state(mesh, state)
    ckpt = CheckpointManager(model_dir, max_to_keep=5)

    n_epochs = int(max_epochs if max_epochs is not None
                   else cfg_yaml.TRAIN.MAX_EPOCH)

    def epoch_grids(state, last_batch, epoch):
        b = min(64, last_batch["image"].shape[0])
        z = jax.random.normal(jax.random.fold_in(rng, epoch),
                              (b, model_cfg.z_dim))
        text = (last_batch["text_embedding"][:b]
                if "text_embedding" in last_batch else None)
        fake = sample_fn(state.g_params, state.g_stats, z,
                         last_batch["bbox"][:b],
                         last_batch["label_onehot"][:b], text)
        save_grid(np.asarray(fake),
                  os.path.join(img_dir, f"fake_samples_epoch_{epoch:03d}.png"))
        if epoch == start_epoch:
            save_grid(last_batch["image"][:b],
                      os.path.join(img_dir, "real_samples.png"))

    state, _ = run_epochs(
        loader=loader, state=state, step_fn=step_fn, mesh=mesh, rng=rng,
        lr_g=float(cfg_yaml.TRAIN.GENERATOR_LR),
        lr_d=float(cfg_yaml.TRAIN.DISCRIMINATOR_LR),
        n_epochs=n_epochs, ckpt=ckpt, writer=writer,
        start_epoch=start_epoch,
        lr_decay_epochs=int(cfg_yaml.TRAIN.LR_DECAY_EPOCH),
        snapshot_every=int(cfg_yaml.TRAIN.SNAPSHOT_INTERVAL),
        log_every=log_every, profile_dir=profile_dir,
        epoch_end_fn=epoch_grids)
    ckpt.close()
    writer.close()
    return state
