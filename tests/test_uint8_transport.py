"""uint8 image transport: loaders ship raw uint8, normalize runs on-device.

The reference pipeline keeps uint8 through every PIL transform and only
normalizes in ToTensor (code/multi-mnist/main.py:80-82); shipping uint8
and normalizing on-device (utils.images.as_model_image) is bit-faithful
to that and moves 4x fewer host->device bytes. These tests pin down the
helper's semantics and that a train step fed a uint8 batch computes
exactly what it computes on the pre-normalized float batch.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.utils.images import as_model_image, to_uint8


def test_as_model_image_numpy():
    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16, 1)
    out = as_model_image(u8)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, u8.astype(np.float32) / 127.5 - 1.0)
    # float input passes through untouched (same object, no copy)
    f32 = np.zeros((4, 4, 3), np.float32)
    assert as_model_image(f32) is f32


def test_as_model_image_jax_and_roundtrip():
    u8 = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (2, 8, 8, 3), np.uint8))
    out = as_model_image(u8)
    assert out.dtype == jnp.float32
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    # to_uint8 inverts as_model_image exactly
    back = to_uint8(np.asarray(out))
    np.testing.assert_array_equal(back, np.asarray(u8))


def test_to_uint8_passthrough():
    u8 = np.random.RandomState(1).randint(0, 256, (8, 8, 3), np.uint8)
    np.testing.assert_array_equal(to_uint8(u8), u8)
    gray = u8[..., :1]
    out = to_uint8(gray)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[..., 0], gray[..., 0])


def test_train_step_uint8_equals_prenormalized():
    """One mnist train step on a uint8 batch == the same step on the
    pre-normalized f32 batch (the on-device normalize is exact)."""
    from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
    from multiple_objects_gan_tpu.models import common
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import (
        create_state, make_train_step)

    cfg = dataclasses.replace(common.MNIST, gf_dim=16, df_dim=8)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, d, rng, batch_size=2)
    step = jax.jit(make_train_step(cfg, g, d))

    batch = synthetic_batch(cfg, 4)
    # quantize the synthetic f32 images to the transport format, then
    # compare uint8-in vs its exact f32 normalization
    img = np.asarray(batch["image"])
    q = np.clip((img + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)
    batch_u8 = {**batch, "image": q}
    batch_f32 = {**batch, "image": q.astype(np.float32) / 127.5 - 1.0}

    lr = jnp.float32(2e-4)
    s1, m1 = step(state, {k: jnp.asarray(v) for k, v in batch_u8.items()},
                  rng, lr, lr)
    s2, m2 = step(state, {k: jnp.asarray(v) for k, v in batch_f32.items()},
                  rng, lr, lr)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-5,
                                   err_msg=k)
    # The two dtype signatures compile separately; XLA may fuse the
    # normalize differently, and a 1-ulp input difference can flip an
    # Adam sign where a gradient is ~0 — bounded by 2*lr per element.
    leaves1 = jax.tree.leaves(s1.g_params)
    leaves2 = jax.tree.leaves(s2.g_params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
