"""Word-to-pixel attention (AttnGAN).

Parity targets:
  * GlobalAttentionGeneral (ATT_NET) — code/coco/attngan/GlobalAttention.py:
    72-123: project word embeddings with a 1x1 conv, dot with pixel queries,
    masked softmax over words, produce a per-pixel weighted word context.
  * func_attention — GlobalAttention.py:31-69: DAMSM attention with two
    softmaxes (over source pixels, then gamma1-sharpened over query words).

Layouts here are TPU-native: pixel features NHWC, word embeddings (B, L, D).
Note: the reference's mask indexing (`mask.repeat(queryL, 1)` vs a
batch-major attention matrix, GlobalAttention.py:105-107) misaligns masks
across batch elements whenever batch > 1 — a known upstream AttnGAN bug. We
implement the intended per-sample masking (broadcast over pixels) instead;
behavior is identical for batch size 1 and for uniform-length batches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multiple_objects_gan_tpu.nn.blocks import orthogonal_init

Array = jax.Array

NEG_INF = -1e9


class GlobalAttention(nn.Module):
    """ATT_NET: word context per pixel + attention maps.

    input: h_code (B, H, W, idf), word_embs (B, L, cdf), mask (B, L) bool
           (True = padding position to be masked out)
    returns: (context (B, H, W, idf), attn (B, H, W, L))
    """

    idf: int

    @nn.compact
    def __call__(self, h_code: Array, word_embs: Array,
                 mask: Optional[Array] = None) -> tuple[Array, Array]:
        b, h, w, idf = h_code.shape
        l = word_embs.shape[1]
        # conv1x1 on the (B, cdf, L, 1) "image" == a dense over cdf
        source = nn.Dense(self.idf, use_bias=False,
                          kernel_init=orthogonal_init(),
                          name="conv_context")(word_embs)   # (B, L, idf)

        query = h_code.reshape(b, h * w, idf)
        attn = jnp.einsum("bqd,bld->bql", query, source,
                          precision=jax.lax.Precision.HIGHEST)
        if mask is not None:
            attn = jnp.where(mask[:, None, :], NEG_INF, attn)
        attn = jax.nn.softmax(attn, axis=-1)                # over words
        context = jnp.einsum("bql,bld->bqd", attn, source,
                             precision=jax.lax.Precision.HIGHEST)
        return (context.reshape(b, h, w, idf),
                attn.reshape(b, h, w, l))


def func_attention(query: Array, context: Array, gamma1: float,
                   query_mask: Optional[Array] = None
                   ) -> tuple[Array, Array]:
    """DAMSM attention (GlobalAttention.py:31-69).

    query:   (B, Lq, D)  word embeddings
    context: (B, H, W, D) image region features
    query_mask: (B, Lq) bool, True = padded word (excluded from softmax-2
        normalization is NOT needed — the reference slices to cap_len; we
        mask instead to keep shapes static).
    returns: weighted context (B, Lq, D), attn (B, H, W, Lq)
    """
    b, hh, ww, d = context.shape
    src = context.reshape(b, hh * ww, d)
    attn = jnp.einsum("bsd,bqd->bsq", src, query,
                      precision=jax.lax.Precision.HIGHEST)
    # softmax over query words (Eq. 8)
    if query_mask is not None:
        attn = jnp.where(query_mask[:, None, :], NEG_INF, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    # gamma1-sharpened softmax over source pixels (Eq. 9)
    attn = attn * gamma1
    attn = jax.nn.softmax(attn, axis=1)
    weighted = jnp.einsum("bsd,bsq->bqd", src, attn,
                          precision=jax.lax.Precision.HIGHEST)
    return weighted, attn.reshape(b, hh, ww, -1)
