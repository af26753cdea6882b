"""Stage-2 step decomposition spike (round-3 perf frontier).

The full stage-2 step (cfg/coco_s2_train.yml, bs 40, bf16) measures
117 ms at 48% MFU / 60% HBM utilization — the only variant where
NEITHER roofline binds (tools/bench_variants.py; mnist/clevr/attngan all
sit at ~1.0 HBM util). Device-side op traces are not obtainable through
the tunneled backend, so this spike times ISOLATED jitted pieces of the
step (each synced by fetching a computed scalar, never bare
block_until_ready — see CLAUDE.md) and rooflines each piece from XLA's
own cost analysis, to locate the non-roofline time.

Pieces (mirroring train/step.py:make_stage2_train_step):
  s1_fwd       frozen stage-1 G forward (train-mode BN, 64px)
  g2_fwd       Stage2G forward (encode 64px -> ResBlocks -> 256px)
  g2_fwdbwd    Stage2G forward + full parameter backward
  d2_feat      Stage2D 256px feature stack forward
  d2_fwdbwd    D loss (real+wrong+fake heads) forward + backward
  step         the real fused alternating step (reference timing)

Usage: python tools/spike_stage2_decomp.py  (add --f32 to disable bf16)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_variants import (  # noqa: E402 — sibling tool, same dir
    V5E_HBM_BPS, V5E_PEAK_FLOPS, _cost_analysis)


def _sync_scalar_time(fn, args, n=20, warmup=2):
    """Time fn(*args) -> scalar jax array; fetch the scalar each round."""
    for _ in range(warmup):
        out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--f32", action="store_true")
    p.add_argument("--batch", type=int, default=40)
    args = p.parse_args(argv)

    if not args.f32:
        from multiple_objects_gan_tpu.nn import blocks
        blocks.set_compute_dtype(jnp.bfloat16)

    from multiple_objects_gan_tpu.models import common
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.models.stage2 import (
        COCO_S2, Stage2D, Stage2G)
    from multiple_objects_gan_tpu.train.step import (
        create_state, create_state_stage2, make_stage2_train_step)

    s1_cfg, s2_cfg, bs = common.COCO_S1, COCO_S2, args.batch
    g1 = Stage1G(s1_cfg)
    g2, d2 = Stage2G(s2_cfg), Stage2D(s2_cfg)
    rng = jax.random.PRNGKey(0)
    s1_state = create_state(s1_cfg, g1, Stage1D(s1_cfg), rng, batch_size=2)
    s1_vars = {"params": s1_state.g_params,
               "batch_stats": s1_state.g_stats}
    state = create_state_stage2(s2_cfg, g2, d2, rng, batch_size=2)

    rs = np.random.RandomState(0)
    image = jnp.asarray(rs.rand(bs, 256, 256, 3).astype(np.float32) * 2 - 1)
    bbox = jnp.asarray(np.tile([0.2, 0.2, 0.3, 0.3],
                               (bs, 3, 1)).astype(np.float32))
    labels = jnp.asarray(np.eye(81, dtype=np.float32)[
        rs.randint(0, 81, (bs, 3))])
    text = jnp.asarray(rs.randn(bs, s1_cfg.text_dim).astype(np.float32))
    z = jnp.asarray(rs.randn(bs, s1_cfg.z_dim).astype(np.float32))
    stage1_img = jnp.asarray(
        rs.rand(bs, 64, 64, 3).astype(np.float32) * 2 - 1)

    def report(name, jitted, call_args):
        flops, bts = _cost_analysis(jitted, *call_args)
        dt = _sync_scalar_time(jitted, call_args)
        print(json.dumps({
            "piece": name, "ms": round(dt * 1e3, 2),
            "tflops": round(flops / 1e12, 3),
            "gbytes": round(bts / 1e9, 2),
            "mfu": round(flops / dt / V5E_PEAK_FLOPS, 3),
            "hbm_util": round(bts / dt / V5E_HBM_BPS, 3),
        }), flush=True)
        return dt

    # --- frozen stage-1 G forward (train-mode, stats discarded) ---
    @jax.jit
    def s1_fwd(v, z, bbox, labels, text, r):
        out = g1.apply(v, z, bbox, labels, text, train=True, ca_rng=r,
                       mutable=["batch_stats"])[0]
        return jnp.sum(out["img"].astype(jnp.float32))

    report("s1_fwd", s1_fwd, (s1_vars, z, bbox, labels, text, rng))

    # --- Stage2G forward ---
    g2_vars = {"params": state.g_params, "batch_stats": state.g_stats}

    @jax.jit
    def g2_fwd(v, img1, bbox, bbox2, labels, text, r):
        out = g2.apply(v, img1, bbox, bbox2, labels, text, train=True,
                       ca_rng=r, mutable=["batch_stats"])[0]
        return jnp.sum(out["img"].astype(jnp.float32))

    report("g2_fwd", g2_fwd,
           (g2_vars, stage1_img, bbox, bbox, labels, text, rng))

    # --- Stage2G forward + parameter backward ---
    @jax.jit
    def g2_fwdbwd(params, stats, img1, bbox, bbox2, labels, text, r):
        def loss(p):
            out = g2.apply({"params": p, "batch_stats": stats}, img1,
                           bbox, bbox2, labels, text, train=True,
                           ca_rng=r, mutable=["batch_stats"])[0]
            return jnp.sum(out["img"].astype(jnp.float32))
        l, grads = jax.value_and_grad(loss)(params)
        return l + sum(jnp.sum(jnp.abs(g)) for g in
                       jax.tree.leaves(grads)[:1])

    report("g2_fwdbwd", g2_fwdbwd,
           (state.g_params, state.g_stats, stage1_img, bbox, bbox, labels,
            text, rng))

    # --- Stage2D 256px feature stack forward ---
    d2_vars = {"params": state.d_params, "batch_stats": state.d_stats}

    @jax.jit
    def d2_feat(v, img, labels, bbox2):
        feat, _ = d2.apply(v, img, labels, bbox2, train=True,
                           mutable=["batch_stats"])
        return jnp.sum(feat.astype(jnp.float32))

    report("d2_feat", d2_feat, (d2_vars, image, labels, bbox))

    # --- D loss fwd+bwd (features + cond head, real only) ---
    @jax.jit
    def d2_fwdbwd(params, stats, img, labels, bbox2, cond):
        def loss(p):
            v = {"params": p, "batch_stats": stats}
            feat, _ = d2.apply(v, img, labels, bbox2, train=True,
                               mutable=["batch_stats"])
            lc, _ = d2.apply(v, feat, cond, train=True,
                             method=d2.cond_logits,
                             mutable=["batch_stats"])
            return jnp.sum(jax.nn.log_sigmoid(
                lc.astype(jnp.float32)))
        l, grads = jax.value_and_grad(loss)(params)
        return l + jnp.sum(jnp.abs(jax.tree.leaves(grads)[0]))

    cond = jnp.asarray(
        rs.randn(bs, s2_cfg.condition_dim).astype(np.float32))
    report("d2_fwdbwd", d2_fwdbwd,
           (state.d_params, state.d_stats, image, labels, bbox, cond))

    # --- the real full step ---
    step = jax.jit(make_stage2_train_step(s2_cfg, s1_cfg, g1, g2, d2),
                   donate_argnums=(0,))
    batch = {"image": image, "bbox": bbox, "bbox_s2": bbox,
             "label_onehot": labels, "text_embedding": text}
    lr = jnp.float32(2e-4)

    flops, bts = _cost_analysis(step, state, s1_vars, batch, rng, lr, lr)
    for _ in range(2):
        state2, m = step(state if _ == 0 else state2, s1_vars, batch,
                         rng, lr, lr)
    float(m["d_loss"])
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        state2, m = step(state2, s1_vars, batch, rng, lr, lr)
    float(m["d_loss"])
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "piece": "step", "ms": round(dt * 1e3, 2),
        "tflops": round(flops / 1e12, 3),
        "gbytes": round(bts / 1e9, 2),
        "mfu": round(flops / dt / V5E_PEAK_FLOPS, 3),
        "hbm_util": round(bts / dt / V5E_HBM_BPS, 3),
    }), flush=True)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
