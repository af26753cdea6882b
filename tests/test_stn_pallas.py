"""Fused Pallas STN kernel A/B test vs the XLA path (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import multiple_objects_gan_tpu.ops.stn_pallas as sp
from multiple_objects_gan_tpu.ops import stn_place_multi


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(sp.pl, "pallas_call", patched)


def test_pallas_place_matches_xla_path():
    rng = np.random.RandomState(0)
    b, o, h, w, c = 2, 3, 16, 16, 8
    feats = jnp.asarray(rng.randn(b, o, h, w, c).astype(np.float32))
    bbox = jnp.asarray(np.stack(
        [rng.uniform(0.05, 0.5, (b, o)), rng.uniform(0.05, 0.5, (b, o)),
         rng.uniform(0.2, 0.4, (b, o)), rng.uniform(0.2, 0.4, (b, o))],
        -1).astype(np.float32))
    want = np.asarray(stn_place_multi(feats, bbox, (16, 16)))
    got = np.asarray(sp.stn_place_multi_pallas(feats, bbox, (16, 16)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_place_padded_bbox_zero():
    feats = jnp.ones((1, 2, 8, 8, 8))
    bbox = jnp.full((1, 2, 4), -1.0)
    out = np.asarray(sp.stn_place_multi_pallas(feats, bbox, (16, 16)))
    np.testing.assert_allclose(out, 0.0)


def test_pallas_fused_grad_matches_xla_path():
    """custom_vjp backward (exact-transpose extract kernel) vs autodiff of
    the XLA separable path."""
    rng = np.random.RandomState(1)
    b, o, h, w, c = 2, 3, 16, 16, 8
    feats = jnp.asarray(rng.randn(b, o, h, w, c).astype(np.float32))
    bbox = jnp.asarray(np.stack(
        [rng.uniform(0.05, 0.5, (b, o)), rng.uniform(0.05, 0.5, (b, o)),
         rng.uniform(0.2, 0.4, (b, o)), rng.uniform(0.2, 0.4, (b, o))],
        -1).astype(np.float32))
    cot = jnp.asarray(rng.randn(b, 16, 16, c).astype(np.float32))

    def loss_xla(f):
        return jnp.vdot(stn_place_multi(f, bbox, (16, 16)), cot)

    def loss_pallas(f):
        return jnp.vdot(sp.stn_place_multi_fused(f, bbox, (16, 16)), cot)

    g_want = np.asarray(jax.grad(loss_xla)(feats))
    g_got = np.asarray(jax.grad(loss_pallas)(feats))
    np.testing.assert_allclose(g_got, g_want, atol=1e-4)
