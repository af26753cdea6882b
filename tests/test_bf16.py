"""bf16-activation mixed precision: step runs finite, master weights stay
f32, and the knob restores cleanly (nn/blocks.py:set_compute_dtype)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
from multiple_objects_gan_tpu.models import common
from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
from multiple_objects_gan_tpu.nn import blocks
from multiple_objects_gan_tpu.train.step import create_state, make_train_step


def test_bf16_train_step_finite_f32_master_weights():
    cfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=4)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 8).items()}

    blocks.set_compute_dtype(jnp.bfloat16)
    try:
        state = create_state(cfg, g, d, rng, batch_size=2)
        step = jax.jit(make_train_step(cfg, g, d))
        for _ in range(2):
            state, metrics = step(state, batch, rng, jnp.float32(2e-4),
                                  jnp.float32(2e-4))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # master weights and BN running stats stay f32
        for leaf in jax.tree.leaves(state.g_params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.g_stats):
            assert leaf.dtype == jnp.float32
        # the bf16 forward actually differs from f32 only within bf16 noise
        blocks.set_compute_dtype(None)
        step32 = jax.jit(make_train_step(cfg, g, d))
        state32 = create_state(cfg, g, d, rng, batch_size=2)
        _, m32 = step32(state32, batch, rng, jnp.float32(2e-4),
                        jnp.float32(2e-4))
        blocks.set_compute_dtype(jnp.bfloat16)
        state16 = create_state(cfg, g, d, rng, batch_size=2)
        step16 = jax.jit(make_train_step(cfg, g, d))
        _, m16 = step16(state16, batch, rng, jnp.float32(2e-4),
                        jnp.float32(2e-4))
        np.testing.assert_allclose(float(m16["d_loss"]),
                                   float(m32["d_loss"]), rtol=0.05)
    finally:
        blocks.set_compute_dtype(None)


def test_late_knob_set_warns_after_eval_only_trace(monkeypatch):
    """Setting a trace-time knob after ANY model trace — including an
    eval/init-only one that never enters TorchBatchNorm's train branch —
    must warn about stale cached executables (round-4 review: the read
    marker used to live only in the BN train path)."""
    import warnings

    import pytest

    monkeypatch.setattr(blocks, "_KNOBS_READ", False)
    conv = blocks.Conv3x3(4)
    x = jnp.zeros((1, 8, 8, 3))
    v = jax.jit(conv.init)(jax.random.PRNGKey(0), x)  # eval-only trace
    jax.jit(conv.apply)(v, x)
    assert blocks._KNOBS_READ
    try:
        with pytest.warns(UserWarning, match="AFTER"):
            blocks.set_compute_dtype(jnp.bfloat16)
    finally:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            blocks.set_compute_dtype(None)


def test_bf16_sample_fn_returns_f32():
    """Eval outputs must come back f32 under a bf16 compute dtype: NumPy
    keeps ml_dtypes bf16 through np.asarray and then ACCUMULATES
    REDUCTIONS IN BF16 — a mean over ~1e5 pixels saturates to ~0
    (this silently zeroed the first content-in-bbox validation)."""
    from multiple_objects_gan_tpu.train.step import make_sample_fn

    cfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=4)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    batch = synthetic_batch(cfg, 4)
    blocks.set_compute_dtype(jnp.bfloat16)
    try:
        state = create_state(cfg, g, d, rng, batch_size=2)
        sample = make_sample_fn(cfg, g)
        img = sample(state.g_params, state.g_stats,
                     jax.random.normal(rng, (4, cfg.z_dim)),
                     jnp.asarray(batch["bbox"]),
                     jnp.asarray(batch["label_onehot"]), None)
        assert img.dtype == jnp.float32
        # the numpy round-trip keeps full precision now
        assert np.isfinite(np.asarray(img).mean())
    finally:
        blocks.set_compute_dtype(None)
