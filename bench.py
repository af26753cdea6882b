"""Headline benchmark: Multi-MNIST 64px training throughput (images/sec/chip).

Baseline target (BASELINE.md): >= 3000 images/sec/chip on TPU v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 3000.0


def main():
    from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
    from multiple_objects_gan_tpu.models import common
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import (
        create_state, make_train_step)

    cfg = common.MNIST  # full reference width: GF_DIM=128, DF_DIM=64
    batch_size = 128    # reference cfg/mnist_train.yml TRAIN.BATCH_SIZE
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, d, rng, batch_size=2)
    step = jax.jit(make_train_step(cfg, g, d), donate_argnums=(0,))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch_size).items()}
    lr = jnp.float32(2e-4)

    # warmup / compile
    for _ in range(3):
        state, _ = step(state, batch, rng, lr, lr)
    jax.block_until_ready(state.g_params)

    # best of 3 timing rounds (guards against transient host contention)
    n_steps = 30
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch, rng, lr, lr)
        jax.block_until_ready(state.g_params)
        best_dt = min(best_dt, time.perf_counter() - t0)

    n_chips = jax.device_count()
    img_per_sec_per_chip = n_steps * batch_size / best_dt / n_chips
    print(json.dumps({
        "metric": "multi_mnist_train_throughput",
        "value": round(img_per_sec_per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec_per_chip / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
