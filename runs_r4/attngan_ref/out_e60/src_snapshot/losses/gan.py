"""Adversarial losses (matching-aware conditional BCE) + CA-net KL.

Parity targets:
  * compute_discriminator_loss / compute_generator_loss —
    code/multi-mnist/miscc/utils.py:71-123, code/clevr/miscc/utils.py:91-144,
    code/coco/stackgan/miscc/utils.py:74-125. BCEWithLogits over
    real+cond -> 1, wrong pairs (real features x shifted conditions) -> 0,
    fake+cond -> 0; with an optional unconditional head the combination is
    (real + uncond_real)/2 + (fake + wrong + uncond_fake)/3, else
    real + (fake + wrong)/2.
  * KL_loss — code/coco/stackgan/miscc/utils.py:68-71:
    -0.5 * mean(1 + logvar - mu^2 - exp(logvar)).

These are pure logit-level functions; the D forwards (and the wrong-pair
feature reuse: real_features[:-1] vs condition[1:]) are orchestrated by the
train step, mirroring the reference's netD / netD.get_cond_logits split.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def bce_with_logits(logits: Array, targets: Array) -> Array:
    """Mean binary cross-entropy on logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    # stable: max(x, 0) - x * t + log(1 + exp(-|x|))
    loss = (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.mean(loss)


def discriminator_loss(real_logits: Array, wrong_logits: Array,
                       fake_logits: Array,
                       uncond_real_logits: Optional[Array] = None,
                       uncond_fake_logits: Optional[Array] = None):
    """Matching-aware D loss. Returns (errD, aux dict of scalars)."""
    err_real = bce_with_logits(real_logits, jnp.ones_like(real_logits))
    err_wrong = bce_with_logits(wrong_logits, jnp.zeros_like(wrong_logits))
    err_fake = bce_with_logits(fake_logits, jnp.zeros_like(fake_logits))

    if uncond_real_logits is not None:
        u_real = bce_with_logits(uncond_real_logits,
                                 jnp.ones_like(uncond_real_logits))
        u_fake = bce_with_logits(uncond_fake_logits,
                                 jnp.zeros_like(uncond_fake_logits))
        err_d = ((err_real + u_real) / 2.0
                 + (err_fake + err_wrong + u_fake) / 3.0)
        aux = {"d_loss_real": (err_real + u_real) / 2.0,
               "d_loss_wrong": err_wrong,
               "d_loss_fake": (err_fake + u_fake) / 2.0}
    else:
        err_d = err_real + (err_fake + err_wrong) * 0.5
        aux = {"d_loss_real": err_real, "d_loss_wrong": err_wrong,
               "d_loss_fake": err_fake}
    return err_d, aux


def generator_adv_loss(fake_logits: Array,
                       uncond_fake_logits: Optional[Array] = None) -> Array:
    """G adversarial loss: fake + cond -> 1 (+ unconditional term)."""
    err = bce_with_logits(fake_logits, jnp.ones_like(fake_logits))
    if uncond_fake_logits is not None:
        err = err + bce_with_logits(uncond_fake_logits,
                                    jnp.ones_like(uncond_fake_logits))
    return err


def kl_loss(mu: Array, logvar: Array) -> Array:
    """CA-net KL divergence to N(0, I) (stackgan miscc/utils.py:68-71)."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    element = 1.0 + logvar - jnp.square(mu) - jnp.exp(logvar)
    return -0.5 * jnp.mean(element)
