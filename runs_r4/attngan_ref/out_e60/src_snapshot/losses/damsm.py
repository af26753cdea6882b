"""DAMSM word/sentence matching losses (AttnGAN generator loss).

Parity targets (code/coco/attngan/miscc/losses.py):
  * sent_loss (:20-59): image<->sentence InfoNCE-style CE over the batch,
    gamma3 scaling, class-id masking (same-class non-diagonal pairs
    excluded).
  * words_loss (:62-132): per-word attention-weighted region matching via
    func_attention (gamma1), gamma2 log-sum-exp aggregation, gamma3-scaled
    CE in both directions.

TPU translation: the reference's per-sample Python loop over dynamic
caption lengths becomes a vmap over the batch with padding masks — static
shapes, identical math (padded words contribute exactly zero because the
reference slices them away and we mask them out of both the attention
normalization and the log-sum-exp).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from multiple_objects_gan_tpu.nn.attention import func_attention

Array = jax.Array

NEG_INF = -1e9
EPS = 1e-8


def _class_mask(class_ids: Array) -> Array:
    """(B,) -> (B, B) bool: True where pair shares a class and i != j."""
    eq = class_ids[:, None] == class_ids[None, :]
    return eq & ~jnp.eye(class_ids.shape[0], dtype=bool)


def _ce_both_ways(scores: Array) -> tuple[Array, Array]:
    """CrossEntropy with labels = arange(B), both directions."""
    b = scores.shape[0]
    labels = jnp.arange(b)
    logp0 = jax.nn.log_softmax(scores, axis=1)
    logp1 = jax.nn.log_softmax(scores.T, axis=1)
    loss0 = -jnp.mean(logp0[labels, labels])
    loss1 = -jnp.mean(logp1[labels, labels])
    return loss0, loss1


def sent_loss(cnn_code: Array, rnn_code: Array,
              class_ids: Optional[Array], gamma3: float = 10.0
              ) -> tuple[Array, Array]:
    """cnn_code, rnn_code: (B, nef). Returns (loss0, loss1)."""
    cn = jnp.linalg.norm(cnn_code, axis=-1, keepdims=True)
    rn = jnp.linalg.norm(rnn_code, axis=-1, keepdims=True)
    scores = (cnn_code @ rnn_code.T) / jnp.maximum(cn @ rn.T, EPS) * gamma3
    if class_ids is not None:
        scores = jnp.where(_class_mask(class_ids), NEG_INF, scores)
    return _ce_both_ways(scores)


def words_loss(img_features: Array, words_emb: Array, cap_lens: Array,
               class_ids: Optional[Array], gamma1: float = 4.0,
               gamma2: float = 5.0, gamma3: float = 10.0
               ) -> tuple[Array, Array, Array]:
    """img_features: (B, 17, 17, nef); words_emb: (B, T, nef);
    cap_lens: (B,). Returns (loss0, loss1, att_maps (B, 17, 17, T))."""
    b, t, _ = words_emb.shape
    word_mask = jnp.arange(t)[None, :] >= cap_lens[:, None]  # True = pad

    def one_caption(word_i, mask_i):
        """Caption i's words vs ALL images -> (B,) similarities + attn."""
        word = jnp.broadcast_to(word_i[None], (b,) + word_i.shape)
        wei, attn = func_attention(word, img_features, gamma1,
                                   query_mask=jnp.broadcast_to(
                                       mask_i[None], (b, t)))
        # row_sim: cosine per word, (B, T)
        num = jnp.sum(word * wei, axis=-1)
        den = (jnp.linalg.norm(word, axis=-1)
               * jnp.linalg.norm(wei, axis=-1))
        row_sim = num / jnp.maximum(den, EPS)
        # gamma2 log-sum-exp over REAL words only (losses.py:104-107)
        e = jnp.exp(row_sim * gamma2) * (~mask_i)[None, :]
        return jnp.log(jnp.maximum(e.sum(axis=1), EPS)), attn

    sims, attns = jax.vmap(one_caption)(words_emb, word_mask)
    # sims[i, j] = similarity of image j with caption i; reference builds
    # similarities[j, i] (image-major) — transpose to match
    scores = sims.T * gamma3
    if class_ids is not None:
        scores = jnp.where(_class_mask(class_ids), NEG_INF, scores)
    loss0, loss1 = _ce_both_ways(scores)
    # att map for caption i on its own image (losses.py:93): attns[i, i]
    own_att = jnp.take_along_axis(
        attns, jnp.arange(b).reshape(b, 1, 1, 1, 1), axis=1)[:, 0]
    return loss0, loss1, own_att
