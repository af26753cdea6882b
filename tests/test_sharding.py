"""SPMD data-parallel tests on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
from multiple_objects_gan_tpu.models import common
from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
from multiple_objects_gan_tpu.parallel import mesh as pmesh
from multiple_objects_gan_tpu.train.step import create_state, make_train_step


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    return pmesh.make_mesh(8)


def test_train_step_over_8_device_mesh(mesh):
    cfg = dataclasses.replace(common.MNIST, gf_dim=16, df_dim=8)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, d, rng, batch_size=2)
    state = pmesh.replicate_state(mesh, state)
    step = pmesh.jit_train_step(make_train_step(cfg, g, d))

    batch = synthetic_batch(cfg, 16)
    sharded = pmesh.shard_batch(mesh, batch)
    # batch really is sharded over all 8 devices
    assert len(sharded["image"].sharding.device_set) == 8
    state, metrics = step(state, sharded, rng,
                          jnp.float32(2e-4), jnp.float32(2e-4))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params stay replicated after the step
    leaf = jax.tree.leaves(state.g_params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_matches_single_device():
    """The SPMD step must compute the same update as single-device
    (global-batch BN + full-batch loss make this exact up to fp noise)."""
    cfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=4)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(1)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 8).items()}

    state1 = create_state(cfg, g, d, rng, batch_size=2)
    step1 = jax.jit(make_train_step(cfg, g, d))
    state1, m1 = step1(state1, batch, rng, jnp.float32(2e-4),
                       jnp.float32(2e-4))

    mesh = pmesh.make_mesh(8)
    state8 = create_state(cfg, g, d, rng, batch_size=2)
    state8 = pmesh.replicate_state(mesh, state8)
    sharded = pmesh.shard_batch(mesh, {k: np.asarray(v)
                                       for k, v in batch.items()})
    step8 = pmesh.jit_train_step(make_train_step(cfg, g, d))
    state8, m8 = step8(state8, sharded, rng, jnp.float32(2e-4),
                       jnp.float32(2e-4))

    np.testing.assert_allclose(float(m1["d_loss"]), float(m8["d_loss"]),
                               rtol=1e-4)
    l1 = jax.tree.leaves(jax.device_get(state1.g_params))
    l8 = jax.tree.leaves(jax.device_get(state8.g_params))
    # Adam divides by sqrt(nu): where nu ~ 0, reduction-order fp noise in
    # the sharded grads is amplified — allow 1e-3 on a handful of params
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(a, b, atol=1e-3)
