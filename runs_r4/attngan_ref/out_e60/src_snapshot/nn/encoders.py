"""Frozen DAMSM text / image encoders (AttnGAN).

Parity targets:
  * RNN_ENCODER — code/coco/attngan/model.py:120-204: embedding(300) +
    dropout + single-layer bi-LSTM(128 per direction); word embeddings are
    the per-step outputs, the sentence embedding is the concatenated final
    hidden states. The reference sorts batches for cuDNN packing
    (datasets.py:34-36); here the LSTM is length-masked instead, so batches
    stay unsorted (semantically identical, TPU-friendly static shapes).
  * CNN_ENCODER — model.py:207-313: torchvision Inception-v3 backbone up to
    Mixed_7c (weights imported from the published DAMSM .pth; no download),
    17x17x768 region features -> nef via 1x1 conv, pooled 2048 -> nef via
    linear.

The LSTM is a custom lax.scan with torch gate math/layout (i, f, g, o;
two bias vectors) so published checkpoint weights import verbatim.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multiple_objects_gan_tpu.nn import blocks

Array = jax.Array


# ---------------------------------------------------------------------------
# Text encoder
# ---------------------------------------------------------------------------

class TorchLSTM(nn.Module):
    """Single-layer unidirectional LSTM with exact torch semantics/layout.

    Params: w_ih (4H, In), w_hh (4H, H), b_ih (4H,), b_hh (4H,) with torch
    gate order [i, f, g, o]. Inputs (B, T, In) -> outputs (B, T, H) and the
    final (h, c).
    """

    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, tuple[Array, Array]]:
        b, t, d = x.shape
        h4 = 4 * self.hidden
        k = 1.0 / jnp.sqrt(self.hidden)

        def u(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param("w_ih", u, (h4, d))
        w_hh = self.param("w_hh", u, (h4, self.hidden))
        b_ih = self.param("b_ih", u, (h4,))
        b_hh = self.param("b_hh", u, (h4,))

        # precompute input projections for the whole sequence (one big matmul)
        xp = jnp.einsum("btd,gd->btg", x, w_ih,
                        precision=jax.lax.Precision.HIGHEST) + b_ih + b_hh

        hdim = self.hidden

        def step(carry, xp_t):
            h, c = carry
            gates = xp_t + jnp.einsum(
                "bh,gh->bg", h, w_hh, precision=jax.lax.Precision.HIGHEST)
            i = jax.nn.sigmoid(gates[:, :hdim])
            f = jax.nn.sigmoid(gates[:, hdim:2 * hdim])
            g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
            o = jax.nn.sigmoid(gates[:, 3 * hdim:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        init = (jnp.zeros((b, hdim), x.dtype), jnp.zeros((b, hdim), x.dtype))
        (hf, cf), outs = jax.lax.scan(step, init,
                                      jnp.swapaxes(xp, 0, 1))
        return jnp.swapaxes(outs, 0, 1), (hf, cf)


def _flip_valid(x: Array, lengths: Array) -> Array:
    """Reverse each sequence within its valid prefix (padding stays put)."""
    b, t = x.shape[:2]
    idx = jnp.arange(t)[None, :]                     # (1, T)
    src = lengths[:, None] - 1 - idx                 # reversed index
    src = jnp.where(idx < lengths[:, None], src, idx)
    return jnp.take_along_axis(
        x, src.reshape(src.shape + (1,) * (x.ndim - 2)).astype(jnp.int32),
        axis=1)


class RNNEncoder(nn.Module):
    """Bi-LSTM text encoder. Returns (words_emb (B, T, 2H), sent_emb (B, 2H)).

    Padded output positions are zeroed (parity with pad_packed_sequence).
    """

    ntoken: int
    ninput: int = 300
    nhidden: int = 256       # total; 128 per direction (model.py:138-139)
    drop_prob: float = 0.5

    @nn.compact
    def __call__(self, captions: Array, cap_lens: Array, *,
                 train: bool = False,
                 dropout_rng: Optional[Array] = None) -> tuple[Array, Array]:
        h = self.nhidden // 2

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -0.1, 0.1)

        table = self.param("encoder", uinit, (self.ntoken, self.ninput))
        emb = jnp.take(table, captions, axis=0)        # (B, T, ninput)
        if train and dropout_rng is not None:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - self.drop_prob,
                                        emb.shape)
            emb = jnp.where(keep, emb / (1.0 - self.drop_prob), 0.0)

        valid = (jnp.arange(captions.shape[1])[None, :]
                 < cap_lens[:, None])                  # (B, T)

        fwd_out, (h_f, _) = TorchLSTM(h, name="rnn_fwd")(emb)
        emb_rev = _flip_valid(emb, cap_lens)
        bwd_out_r, (h_b, _) = TorchLSTM(h, name="rnn_bwd")(emb_rev)
        bwd_out = _flip_valid(bwd_out_r, cap_lens)

        # final forward state at t = len-1 (scan final state runs over
        # padding; gather the state at the last valid step instead)
        idx = (cap_lens - 1).astype(jnp.int32)
        h_f_last = jnp.take_along_axis(
            fwd_out, idx[:, None, None].repeat(h, axis=2), axis=1)[:, 0]
        # final backward state = output of the reversed scan at t = len-1,
        # which equals bwd_out at t=0
        h_b_last = bwd_out[:, 0]

        words = jnp.concatenate([fwd_out, bwd_out], axis=-1)
        words = jnp.where(valid[:, :, None], words, 0.0)
        sent = jnp.concatenate([h_f_last, h_b_last], axis=-1)
        return words, sent


# ---------------------------------------------------------------------------
# Image encoder (Inception-v3 backbone)
# ---------------------------------------------------------------------------

class BasicConv2d(nn.Module):
    """conv(bias=False) + BN(eps=0.001, affine scale/bias) + ReLU."""

    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple | int = 0
    # None -> honor the global mixed-precision knob; an explicit dtype
    # pins the block (the canonical FID encoder forces f32 so published-
    # number comparability never depends on --bf16)
    dtype: Optional[jnp.dtype] = None
    # None -> backend-default matmul precision; the canonical FID encoder
    # pins HIGHEST so the metric matches the pytorch-fid oracle on TPU
    # (default conv precision there is bf16-ish)
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        # honors the global mixed-precision knob (blocks.set_compute_dtype):
        # the backbone is a frozen feature extractor, so bf16 activations
        # here only touch the DAMSM-loss gradient path; CNNEncoder casts
        # its outputs back to f32 so loss math and FID stay f32
        dtype = (self.dtype if self.dtype is not None
                 else blocks.compute_dtype())
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride), padding=pad,
                    use_bias=False, dtype=dtype, precision=self.precision,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=0.001,
                         momentum=0.9, dtype=dtype,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _max_pool3_s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x, train)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3, train)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool3(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    # forwarded to every BasicConv2d: the canonical FID encoder reuses
    # this block and must pin f32/HIGHEST (see nn/fid_inception.py)
    dtype: Optional[jnp.dtype] = None
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x, train=False):
        p = {"dtype": self.dtype, "precision": self.precision}
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3", **p)(x, train)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", **p)(x, train)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2", **p)(bd, train)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3", **p)(bd, train)
        return jnp.concatenate([b3, bd, _max_pool3_s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd, train)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    # forwarded to every BasicConv2d (see InceptionB / nn/fid_inception.py)
    dtype: Optional[jnp.dtype] = None
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x, train=False):
        p = {"dtype": self.dtype, "precision": self.precision}
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", **p)(x, train)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2", **p)(b3, train)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1", **p)(x, train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2", **p)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3", **p)(b7, train)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4", **p)(b7, train)
        return jnp.concatenate([b3, b7, _max_pool3_s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x, train)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class CNNEncoder(nn.Module):
    """Inception-v3 DAMSM image encoder (model.py:207-313).

    input: (B, H, W, 3) images in [-1, 1] (resized internally to 299x299,
    bilinear, half-pixel centers). Returns (region features (B, 17, 17, nef),
    global code (B, nef)).
    """

    nef: int = 256

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 return_pool: bool = False):
        b = x.shape[0]
        x = jax.image.resize(x, (b, 299, 299, x.shape[-1]), method="bilinear")
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x, train)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x, train)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x, train)
        x = _max_pool3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x, train)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x, train)
        x = _max_pool3_s2(x)
        x = InceptionA(32, name="Mixed_5b")(x, train)
        x = InceptionA(64, name="Mixed_5c")(x, train)
        x = InceptionA(64, name="Mixed_5d")(x, train)
        x = InceptionB(name="Mixed_6a")(x, train)
        x = InceptionC(128, name="Mixed_6b")(x, train)
        x = InceptionC(160, name="Mixed_6c")(x, train)
        x = InceptionC(160, name="Mixed_6d")(x, train)
        x = InceptionC(192, name="Mixed_6e")(x, train)
        features = x                                  # (B, 17, 17, 768)
        x = InceptionD(name="Mixed_7a")(x, train)
        x = InceptionE(name="Mixed_7b")(x, train)
        x = InceptionE(name="Mixed_7c")(x, train)
        x = nn.avg_pool(x, (8, 8))                    # (B, 1, 1, 2048)
        x = x.reshape(b, -1)

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -0.1, 0.1)

        # outputs in f32 regardless of the backbone compute dtype: DAMSM
        # loss math and FID statistics stay full precision
        x = x.astype(jnp.float32)
        features = features.astype(jnp.float32)
        cnn_code = nn.Dense(self.nef, kernel_init=uinit,
                            name="emb_cnn_code")(x)
        region = nn.Dense(self.nef, use_bias=False, kernel_init=uinit,
                          name="emb_features")(features)  # 1x1 conv == dense
        if return_pool:
            # raw 2048-d pooled backbone features (for FID)
            return region, cnn_code, x
        return region, cnn_code
