"""Stage-1 model family + train step tests (all three variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
from multiple_objects_gan_tpu.models import common
from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
from multiple_objects_gan_tpu.train.step import (
    create_state,
    make_sample_fn,
    make_train_step,
)

VARIANTS = [common.MNIST, common.CLEVR, common.COCO_S1]


def _small(cfg):
    """Shrink widths so CPU tests are fast; structure unchanged."""
    import dataclasses
    return dataclasses.replace(cfg, gf_dim=16, df_dim=8,
                               text_dim=32 if cfg.use_ca else 0)


@pytest.mark.parametrize("cfg", VARIANTS, ids=lambda c: c.variant)
def test_generator_forward_shapes(cfg):
    cfg = _small(cfg)
    g = Stage1G(cfg)
    b = 2
    batch = synthetic_batch(cfg, b)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((b, cfg.z_dim))
    variables = g.init(rng, z, jnp.asarray(batch["bbox"]),
                       jnp.asarray(batch["label_onehot"]),
                       jnp.asarray(batch["text_embedding"]) if cfg.use_ca else None,
                       train=True, ca_rng=rng if cfg.use_ca else None)
    out, _ = g.apply(variables, z, jnp.asarray(batch["bbox"]),
                     jnp.asarray(batch["label_onehot"]),
                     jnp.asarray(batch["text_embedding"]) if cfg.use_ca else None,
                     train=True, ca_rng=rng if cfg.use_ca else None,
                     mutable=["batch_stats"])
    assert out["img"].shape == (b, 64, 64, cfg.img_channels)
    assert np.all(np.abs(np.asarray(out["img"])) <= 1.0)
    if cfg.use_ca:
        assert out["mu"].shape == (b, cfg.condition_dim)
        assert out["logvar"].shape == (b, cfg.condition_dim)


@pytest.mark.parametrize("cfg", VARIANTS, ids=lambda c: c.variant)
def test_discriminator_forward_shapes(cfg):
    cfg = _small(cfg)
    d = Stage1D(cfg)
    b = 2
    batch = synthetic_batch(cfg, b)
    rng = jax.random.PRNGKey(0)
    img = jnp.asarray(batch["image"])
    labels = jnp.asarray(batch["label_onehot"])
    bbox = jnp.asarray(batch["bbox"])
    variables = d.init(rng, img, labels, bbox, train=True)
    feat, _ = d.apply(variables, img, labels, bbox, train=True,
                      mutable=["batch_stats"])
    assert feat.shape == (b, 4, 4, cfg.df_dim * 8)
    head_vars = d.init(rng, feat, jnp.zeros((b, cfg.d_cond_dim)), train=True,
                       method="cond_logits")
    logits, _ = d.apply(head_vars, feat, jnp.zeros((b, cfg.d_cond_dim)),
                        train=True, method="cond_logits",
                        mutable=["batch_stats"])
    assert logits.shape == (b,)


@pytest.mark.parametrize("cfg", VARIANTS, ids=lambda c: c.variant)
def test_train_step_runs_and_updates(cfg):
    cfg = _small(cfg)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(42)
    state = create_state(cfg, g, d, rng, batch_size=4)
    step_fn = jax.jit(make_train_step(cfg, g, d))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 4).items()}

    g0 = np.asarray(jax.tree.leaves(state.g_params)[0]).copy()
    d0 = np.asarray(jax.tree.leaves(state.d_params)[0]).copy()
    for i in range(2):
        state, metrics = step_fn(state, batch, rng,
                                 jnp.float32(2e-4), jnp.float32(2e-4))
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # params actually moved from their pre-step values (a zero-gradient
    # regression must fail here)
    assert np.abs(np.asarray(jax.tree.leaves(state.g_params)[0])
                  - g0).max() > 0
    assert np.abs(np.asarray(jax.tree.leaves(state.d_params)[0])
                  - d0).max() > 0


def test_losses_decrease_over_steps_mnist():
    """D should learn to separate real/fake on a toy problem."""
    cfg = _small(common.MNIST)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(7)
    state = create_state(cfg, g, d, rng, batch_size=8)
    step_fn = jax.jit(make_train_step(cfg, g, d))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 8).items()}
    d_losses = []
    for i in range(12):
        state, metrics = step_fn(state, batch, rng,
                                 jnp.float32(2e-4), jnp.float32(2e-4))
        d_losses.append(float(metrics["d_loss"]))
    assert np.mean(d_losses[-4:]) < np.mean(d_losses[:4])


def test_sample_fn_deterministic():
    cfg = _small(common.MNIST)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(3)
    state = create_state(cfg, g, d, rng, batch_size=2)
    sample = make_sample_fn(cfg, g)
    batch = synthetic_batch(cfg, 2)
    z = jax.random.normal(rng, (2, cfg.z_dim))
    img1 = sample(state.g_params, state.g_stats, z,
                  jnp.asarray(batch["bbox"]), jnp.asarray(batch["label_onehot"]))
    img2 = sample(state.g_params, state.g_stats, z,
                  jnp.asarray(batch["bbox"]), jnp.asarray(batch["label_onehot"]))
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2))
    assert img1.shape == (2, 64, 64, 1)
