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

    def run(z):
        img = sample(state.g_params, state.g_stats, z, bbox, labels, text)
        # computed scalar forces real completion when fetched
        return img, jnp.sum(img[0, 0, 0])

    zs = [jax.random.normal(jax.random.fold_in(rng, i), (bs, mcfg.z_dim))
          for i in range(8)]
    for z in zs[:2]:
        _, s = run(z)
    float(s)
    n = 40
    t0 = time.perf_counter()
    for i in range(n):
        _, s = run(zs[i % len(zs)])
    float(s)
    dt = (time.perf_counter() - t0) / n
    return {"variant": name, "batch": bs, "bf16": bf16,
            "ms_per_batch": round(dt * 1e3, 2),
            "img_per_sec": round(bs / dt, 1)}


def main(argv=None):
    args = list(sys.argv[1:] if argv is None else argv)
    bf16 = "--f32" not in args
    names = [a for a in args if not a.startswith("--")] or ["mnist"]
    for name in names:
        print(json.dumps(bench_variant(name, bf16)), flush=True)


if __name__ == "__main__":
    main()
