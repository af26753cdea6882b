"""StackGAN stage-2 model + train step tests (tiny widths, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.models import common
from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
from multiple_objects_gan_tpu.models.stage2 import COCO_S2, Stage2D, Stage2G
from multiple_objects_gan_tpu.train.step import (
    create_state,
    create_state_stage2,
    make_stage2_train_step,
)

S1 = dataclasses.replace(common.COCO_S1, gf_dim=8, df_dim=4, text_dim=16,
                         condition_dim=16, d_cond_dim=16)
S2 = dataclasses.replace(COCO_S2, gf_dim=8, df_dim=4, text_dim=16,
                         condition_dim=16, d_cond_dim=16)


def _batch(b=2, seed=0):
    rng = np.random.RandomState(seed)
    o = 3
    bb = np.stack([rng.uniform(0.1, 0.5, (b, o)), rng.uniform(0.1, 0.5, (b, o)),
                   rng.uniform(0.2, 0.4, (b, o)), rng.uniform(0.2, 0.4, (b, o))],
                  -1).astype(np.float32)
    bb2 = bb.copy()
    lab = np.zeros((b, o, 81), np.float32)
    lab[:, :, 5] = 1.0
    return {
        "image": rng.randn(b, 256, 256, 3).astype(np.float32).clip(-1, 1),
        "bbox": jnp.asarray(bb), "bbox_s2": jnp.asarray(bb2),
        "label_onehot": jnp.asarray(lab),
        "text_embedding": rng.randn(b, 16).astype(np.float32),
    }


def test_stage2_g_forward_shapes():
    g2 = Stage2G(S2, r_num=1)
    b = 2
    batch = _batch(b)
    rng = jax.random.PRNGKey(0)
    s1_img = jnp.zeros((b, 64, 64, 3))
    variables = g2.init(rng, s1_img, batch["bbox"], batch["bbox_s2"],
                        batch["label_onehot"], batch["text_embedding"],
                        train=True, ca_rng=rng)
    out, _ = g2.apply(variables, s1_img, batch["bbox"], batch["bbox_s2"],
                      batch["label_onehot"], batch["text_embedding"],
                      train=True, ca_rng=rng, mutable=["batch_stats"])
    assert out["img"].shape == (b, 256, 256, 3)
    assert out["mu"].shape == (b, S2.condition_dim)


def test_stage2_d_forward_shapes():
    d2 = Stage2D(S2)
    b = 2
    batch = _batch(b)
    rng = jax.random.PRNGKey(0)
    variables = d2.init(rng, jnp.asarray(batch["image"]),
                        batch["label_onehot"], batch["bbox_s2"], train=True)
    feat, _ = d2.apply(variables, jnp.asarray(batch["image"]),
                       batch["label_onehot"], batch["bbox_s2"], train=True,
                       mutable=["batch_stats"])
    assert feat.shape == (b, 4, 4, S2.df_dim * 8)


def test_stage2_train_step():
    g1, d1 = Stage1G(S1), Stage1D(S1)
    g2, d2 = Stage2G(S2, r_num=1), Stage2D(S2)
    rng = jax.random.PRNGKey(1)
    s1_state = create_state(S1, g1, d1, rng, batch_size=2)
    s1_vars = {"params": s1_state.g_params, "batch_stats": s1_state.g_stats}
    state = create_state_stage2(S2, g2, d2, rng, batch_size=2)
    step = jax.jit(make_stage2_train_step(S2, S1, g1, g2, d2))
    batch = {k: jnp.asarray(v) for k, v in _batch(2).items()}
    state, metrics = step(state, s1_vars, batch, rng,
                          jnp.float32(2e-4), jnp.float32(2e-4))
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert "kl_loss" in metrics
