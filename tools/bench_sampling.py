"""Serving benchmark: eval-mode generation throughput (images/sec/chip).

The training headline lives in bench.py; this measures the SERVING path —
`make_sample_fn` (eval-mode BN, deterministic CA) at a given batch size —
the number that matters for bulk sampling / FID dumps / deployment
(docs/SCALING.md). Timing synchronizes by fetching a computed scalar per
round (block_until_ready does not synchronize through the tunneled
backend — see bench.py).

Prints one JSON line per variant:
  {"variant", "batch", "ms_per_batch", "img_per_sec"}

Usage: python tools/bench_sampling.py [mnist|clevr|stackgan1 ...] [--f32]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

VARIANTS = {
    "mnist": ("cfg/mnist_train.yml", "multi-mnist", 128),
    "clevr": ("cfg/clevr_train.yml", "clevr", 128),
    "stackgan1": ("cfg/coco_s1_train.yml", "coco-stackgan", 128),
}


def bench_variant(name: str, bf16: bool) -> dict:
    from multiple_objects_gan_tpu.config.config import (
        cfg_from_file, stage1_model_config)
    from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.nn import blocks
    from multiple_objects_gan_tpu.train.step import (
        create_state, make_sample_fn)

    cfg_file, cfg_variant, bs = VARIANTS[name]
    cfg = cfg_from_file(cfg_file, cfg_variant)
    mcfg = stage1_model_config(cfg, cfg_variant)
    blocks.set_compute_dtype(jnp.bfloat16 if bf16 else None)
    g, d = Stage1G(mcfg), Stage1D(mcfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(mcfg, g, d, rng, batch_size=2)
    batch = synthetic_batch(mcfg, bs)
    bbox = jnp.asarray(batch["bbox"])
    labels = jnp.asarray(batch["label_onehot"])
    text = (jnp.asarray(batch["text_embedding"])
            if "text_embedding" in batch else None)
    sample = make_sample_fn(mcfg, g)

    # the sync scalar is computed INSIDE the jit (params as args) — an
    # eager jnp.sum in the timed loop would add tunnel round-trips per
    # iteration on the axon backend and inflate ms_per_batch
    @jax.jit
    def run(g_params, g_stats, z):
        img = sample(g_params, g_stats, z, bbox, labels, text)
        return img, jnp.sum(img[0, 0, 0])

    zs = [jax.random.normal(jax.random.fold_in(rng, i), (bs, mcfg.z_dim))
          for i in range(8)]
    for z in zs[:2]:
        _, s = run(state.g_params, state.g_stats, z)
    float(s)
    n = 40
    t0 = time.perf_counter()
    for i in range(n):
        _, s = run(state.g_params, state.g_stats, zs[i % len(zs)])
    float(s)
    dt = (time.perf_counter() - t0) / n
    return {"variant": name, "batch": bs, "bf16": bf16,
            "ms_per_batch": round(dt * 1e3, 2),
            "img_per_sec": round(bs / dt, 1)}


def bench_attngan(bf16: bool, bs: int = 32) -> dict:
    """Flagship serving path: RNN text encoder + full-width GNet to 256px
    (the sampling()/gen_example closure shape, cli/attngan_runner.py)."""
    import dataclasses

    from multiple_objects_gan_tpu.models.attngan import COCO_ATTN, GNet
    from multiple_objects_gan_tpu.nn import blocks
    from multiple_objects_gan_tpu.nn.encoders import RNNEncoder

    mcfg = dataclasses.replace(COCO_ATTN, gf_dim=48, df_dim=96,
                               branch_num=3, r_num=2)
    seq = 12
    blocks.set_compute_dtype(jnp.bfloat16 if bf16 else None)
    g = GNet(mcfg)
    text_enc = RNNEncoder(ntoken=100, nhidden=mcfg.embedding_dim)
    rng = jax.random.PRNGKey(0)
    text_vars = jax.jit(lambda r: text_enc.init(
        r, jnp.ones((2, seq), jnp.int32), jnp.full((2,), seq, jnp.int32),
        train=False))(rng)
    g_vars = jax.jit(lambda r: g.init(
        r, jnp.zeros((2, mcfg.z_dim)), jnp.zeros((2, mcfg.embedding_dim)),
        jnp.zeros((2, seq, mcfg.embedding_dim)),
        jnp.zeros((2, seq), bool), jnp.zeros((2, 3, 4)),
        jnp.zeros((2, 3, mcfg.label_dim)), train=False))(rng)

    @jax.jit
    def gen(g_vars, text_vars, caps, lens, bbox, labels, z):
        words, sent = text_enc.apply(text_vars, caps, lens, train=False)
        out = g.apply(g_vars, z, sent, words, caps == 0, bbox, labels,
                      train=False, ca_rng=None)
        img = out["imgs"][-1].astype(jnp.float32)
        return img, jnp.sum(img[0, 0, 0])

    rs = np.random.RandomState(0)
    caps = jnp.asarray(rs.randint(1, 100, (bs, seq)).astype(np.int32))
    lens = jnp.full((bs,), seq, jnp.int32)
    bbox = jnp.asarray(np.tile([0.2, 0.2, 0.3, 0.3],
                               (bs, 3, 1)).astype(np.float32))
    labels = jnp.asarray(
        np.eye(mcfg.label_dim, dtype=np.float32)[rs.randint(
            0, mcfg.label_dim, (bs, 3))])
    zs = [jax.random.normal(jax.random.fold_in(rng, i), (bs, mcfg.z_dim))
          for i in range(4)]
    for z in zs[:2]:
        _, s = gen(g_vars, text_vars, caps, lens, bbox, labels, z)
    float(s)
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        _, s = gen(g_vars, text_vars, caps, lens, bbox, labels,
                   zs[i % len(zs)])
    float(s)
    dt = (time.perf_counter() - t0) / n
    return {"variant": "attngan256", "batch": bs, "bf16": bf16,
            "ms_per_batch": round(dt * 1e3, 2),
            "img_per_sec": round(bs / dt, 1)}


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    bf16 = "--f32" not in args
    names = [a for a in args if not a.startswith("--")] or ["mnist"]
    for name in names:
        if name == "attngan":
            print(json.dumps(bench_attngan(bf16)), flush=True)
        else:
            print(json.dumps(bench_variant(name, bf16)), flush=True)


if __name__ == "__main__":
    main()
