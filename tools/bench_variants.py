"""Secondary benchmarks: per-variant training-step throughput on the TPU.

Prints one JSON line per variant (mnist stage-1, stackgan stage-2,
attngan) at the reference batch sizes. The driver-facing headline stays
bench.py; this script makes the per-variant numbers in ROADMAP.md
reproducible. Timing synchronizes on a computed scalar (see bench.py for
why block_until_ready is not sufficient on this backend).

Usage: python tools/bench_variants.py [mnist|stage2|attngan ...]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

# v5e peaks for MFU / roofline attribution (see bench.py):
V5E_PEAK_FLOPS = 197e12   # bf16 TFLOP/s
V5E_HBM_BPS = 819e9       # HBM bandwidth, bytes/s


def _compile(jitted, *args):
    """AOT-compile ONCE and reuse the executable for both cost analysis
    and the timing loop — lowering separately from the timed jit calls
    paid a second full compile per variant on the tunneled TPU (1-5 min
    each, and the tunnel occasionally wedges; ADVICE r3)."""
    return jitted.lower(*args).compile()


def _cost_analysis(compiled):
    """XLA's own FLOP + bytes-accessed count for one compiled step."""
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return (float(cost.get("flops", 0.0)),
            float(cost.get("bytes accessed", 0.0)))


def _roofline(result: dict, flops: float, bytes_acc: float,
              dt: float) -> dict:
    """Attach MFU + HBM utilization and which roof binds the step.

    mfu = achieved FLOP rate / MXU peak; hbm_util = achieved
    bytes-accessed rate / HBM peak (bytes-accessed includes on-chip
    reuse XLA counts, so >1.0 readings mean fusion hit cache, not a
    timing bug). The larger of the two is the binding roof."""
    mfu = flops / dt / V5E_PEAK_FLOPS
    hbm = bytes_acc / dt / V5E_HBM_BPS
    result.update({
        "tflops_per_step": round(flops / 1e12, 4),
        "gbytes_per_step": round(bytes_acc / 1e9, 3),
        "mfu": round(mfu, 4),
        "hbm_util": round(hbm, 4),
        "bound": "hbm" if hbm > mfu else "mxu",
    })
    return result


def _sync_time(step, args, n=20, warmup=2, sync_key=None):
    for _ in range(warmup):
        out = step(*args)
        if isinstance(out, tuple):
            args = (out[0],) + args[1:]
    metrics = out[1]
    float(metrics[sync_key or sorted(metrics)[0]])
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(*args)
        args = (out[0],) + args[1:]
    float(out[1][sync_key or sorted(out[1])[0]])
    return (time.perf_counter() - t0) / n


def _bench_stage1(cfg, name, bs):
    from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import (
        create_state, make_train_step)

    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, d, rng, batch_size=2)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, bs).items()}
    step = jax.jit(make_train_step(cfg, g, d), donate_argnums=(0,))
    lr = jnp.float32(2e-4)
    compiled = _compile(step, state, batch, rng, lr, lr)
    flops, bytes_acc = _cost_analysis(compiled)
    dt = _sync_time(lambda s: compiled(s, batch, rng, lr, lr), (state,),
                    sync_key="d_loss")
    return _roofline({"variant": name, "batch": bs,
                      "step_ms": round(dt * 1000, 2),
                      "img_per_sec": round(bs / dt, 1)},
                     flops, bytes_acc, dt)


def bench_mnist():
    from multiple_objects_gan_tpu.models import common
    return _bench_stage1(common.MNIST, "multi-mnist", 128)


def bench_clevr():
    from multiple_objects_gan_tpu.models import common
    # cfg/clevr_train.yml: batch 128, 4 objects, label embedding
    return _bench_stage1(common.CLEVR, "clevr", 128)


def bench_stackgan1():
    from multiple_objects_gan_tpu.models import common
    # cfg/coco_s1_train.yml: batch 128, CA + 81-class labels
    return _bench_stage1(common.COCO_S1, "coco-stackgan-1", 128)


def bench_stage2():
    from multiple_objects_gan_tpu.models import common
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.models.stage2 import (
        COCO_S2, Stage2D, Stage2G)
    from multiple_objects_gan_tpu.train.step import (
        create_state, create_state_stage2, make_stage2_train_step)

    s1_cfg = common.COCO_S1
    s2_cfg = COCO_S2
    bs = 40  # cfg/coco_s2_train.yml TRAIN.BATCH_SIZE
    g1 = Stage1G(s1_cfg)
    g2, d2 = Stage2G(s2_cfg), Stage2D(s2_cfg)
    rng = jax.random.PRNGKey(0)
    s1_state = create_state(s1_cfg, g1, Stage1D(s1_cfg), rng, batch_size=2)
    s1_vars = {"params": s1_state.g_params,
               "batch_stats": s1_state.g_stats}
    state = create_state_stage2(s2_cfg, g2, d2, rng, batch_size=2)
    step = jax.jit(make_stage2_train_step(s2_cfg, s1_cfg, g1, g2, d2),
                   donate_argnums=(0,))
    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.rand(bs, 256, 256, 3).astype(np.float32)
                             * 2 - 1),
        "bbox": jnp.asarray(np.tile([0.2, 0.2, 0.3, 0.3],
                                    (bs, 3, 1)).astype(np.float32)),
        "bbox_s2": jnp.asarray(np.tile([0.2, 0.2, 0.3, 0.3],
                                       (bs, 3, 1)).astype(np.float32)),
        "label_onehot": jnp.asarray(
            np.eye(81, dtype=np.float32)[rs.randint(0, 81, (bs, 3))]),
        "text_embedding": jnp.asarray(
            rs.randn(bs, s1_cfg.text_dim).astype(np.float32)),
    }
    lr = jnp.float32(2e-4)
    compiled = _compile(step, state, s1_vars, batch, rng, lr, lr)
    flops, bytes_acc = _cost_analysis(compiled)
    dt = _sync_time(lambda s: compiled(s, s1_vars, batch, rng, lr, lr),
                    (state,))
    return _roofline({"variant": "coco-stackgan-2", "batch": bs,
                      "step_ms": round(dt * 1000, 2),
                      "img_per_sec": round(bs / dt, 1)},
                     flops, bytes_acc, dt)


def bench_attngan():
    from multiple_objects_gan_tpu.models.attngan import (
        COCO_ATTN, DNet64, DNetScale, GNet)
    from multiple_objects_gan_tpu.nn.encoders import CNNEncoder, RNNEncoder
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state, make_attngan_train_step)

    mcfg = dataclasses.replace(COCO_ATTN, gf_dim=48, df_dim=96,
                               branch_num=3, r_num=2)
    # default = cfg/coco_attn_train.yml; MOG_ATTNGAN_BS sweeps batch scaling
    bs, seq = int(os.environ.get("MOG_ATTNGAN_BS", 14)), 12
    g = GNet(mcfg)
    d_modules = {"d64": DNet64(mcfg),
                 "d128": DNetScale(mcfg, scale=128),
                 "d256": DNetScale(mcfg, scale=256)}
    text_enc = RNNEncoder(ntoken=100, nhidden=mcfg.embedding_dim)
    image_enc = CNNEncoder(nef=mcfg.embedding_dim)
    rng = jax.random.PRNGKey(0)
    text_vars = jax.jit(lambda r: text_enc.init(
        r, jnp.ones((2, seq), jnp.int32), jnp.full((2,), seq, jnp.int32),
        train=False))(rng)
    image_vars = jax.jit(lambda r: image_enc.init(
        r, jnp.zeros((2, 64, 64, 3)), train=False))(rng)
    enc_vars = {"text": text_vars, "image": image_vars}
    state = create_attngan_state(mcfg, g, d_modules, rng, batch_size=2,
                                 seq_len=seq)
    step = jax.jit(make_attngan_train_step(
        mcfg, g, d_modules, text_enc, image_enc,
        smooth={"GAMMA1": 4.0, "GAMMA2": 5.0, "GAMMA3": 10.0,
                "LAMBDA": 50.0}), donate_argnums=(0,))
    rs = np.random.RandomState(0)
    batch = {
        "image64": jnp.asarray(rs.rand(bs, 64, 64, 3).astype(np.float32)
                               * 2 - 1),
        "image128": jnp.asarray(rs.rand(bs, 128, 128, 3).astype(np.float32)
                                * 2 - 1),
        "image256": jnp.asarray(rs.rand(bs, 256, 256, 3).astype(np.float32)
                                * 2 - 1),
        "bbox": jnp.asarray(np.tile([0.2, 0.2, 0.3, 0.3],
                                    (bs, 3, 1)).astype(np.float32)),
        "label_onehot": jnp.asarray(
            np.eye(81, dtype=np.float32)[rs.randint(0, 81, (bs, 3))]),
        "captions": jnp.asarray(
            rs.randint(1, 100, (bs, seq)).astype(np.int32)),
        "cap_lens": jnp.full((bs,), seq, jnp.int32),
        "class_ids": jnp.arange(bs, dtype=jnp.int32),
    }
    lr = jnp.float32(2e-4)
    compiled = _compile(step, state, enc_vars, batch, rng, lr, lr)
    flops, bytes_acc = _cost_analysis(compiled)
    dt = _sync_time(lambda s: compiled(s, enc_vars, batch, rng, lr, lr),
                    (state,), sync_key="d_loss_d64")
    return _roofline({"variant": "coco-attngan", "batch": bs,
                      "step_ms": round(dt * 1000, 2),
                      "img_per_sec": round(bs / dt, 1)},
                     flops, bytes_acc, dt)


BENCHES = {"mnist": bench_mnist, "clevr": bench_clevr,
           "stackgan1": bench_stackgan1, "stage2": bench_stage2,
           "attngan": bench_attngan}


def main():
    import jax.numpy as _jnp

    from multiple_objects_gan_tpu.nn import blocks

    if os.environ.get("MOG_COMPUTE_DTYPE", "").lower() not in ("f32",
                                                               "float32"):
        blocks.set_compute_dtype(_jnp.bfloat16)
    names = sys.argv[1:] or list(BENCHES)
    for name in names:
        print(json.dumps(BENCHES[name]()), flush=True)


if __name__ == "__main__":
    main()
