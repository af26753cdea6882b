"""Object/global pathway modules shared by every G and D variant.

Parity targets (reference files under /root/reference):
  * BBOX_NET (layout encoder) — code/multi-mnist/model.py:80-110 (ch=10,
    c_dim=128), code/clevr/model.py:80-110 and
    code/coco/stackgan/model.py:114-144 (ch = c_dim = cfg.GAN.CONDITION_DIM)
  * G object pathway — model.py:160-169 (tile label 4x4, two upBlocks to
    16x16, STN-place, accumulate)
  * D object pathway — model.py:225-234 (STN-extract 16x16 patch, concat
    tiled label, conv4x4/s1/p1 + BN + LeakyReLU, STN-place back, accumulate)
  * CA_NET — code/coco/stackgan/model.py:44-72 (fc -> mu/logvar,
    reparametrize)

TPU-first translation: the reference's per-object Python loops become a
folded (B*O) batch axis feeding batched STN matmuls — one kernel per stage
instead of O sequential launches. BatchNorm statistics remain EXACT:
``blocks.object_fold`` marks the folded segments, and TorchBatchNorm
computes per-object (and, under BN_GROUPS, per-replica) statistics plus
the reference's sequential running-stat EMA in closed form — identical
train-mode math to the sequential loop, vectorized.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multiple_objects_gan_tpu.nn.blocks import (
    conv_dt,
    Conv3x3,
    Dense,
    TorchBatchNorm,
    UpBlock,
    normal_init,
    object_fold,
)
from multiple_objects_gan_tpu.ops import (
    stn_extract_multi,
    stn_place_const_multi,
    stn_place_multi,
)

Array = jax.Array


class LabelEmbed(nn.Module):
    """Per-object label embedding: Linear(no bias) + BN1d + ReLU.

    Reference ``self.label`` (clevr model.py:138-141, stackgan
    model.py:200-203). Input (B, O, in_dim) -> (B, O, features); BN pools
    stats over B*O (see module docstring).
    """

    features: int
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, labels: Array, train: bool) -> Array:
        b, o, d = labels.shape
        x = labels.reshape(b * o, d)
        with object_fold(o):
            x = Dense(self.features, use_bias=False,
                      kernel_init=self.kernel_init)(x)
            x = TorchBatchNorm()(x, train)
            x = nn.relu(x)
        return x.reshape(b, o, self.features)


class LayoutEncoder(nn.Module):
    """BBOX_NET: paste per-object label vectors into a 16x16 canvas via STN,
    encode with three stride-2 conv3x3 blocks (first without BN), flatten.

    in: labels (B, O, label_ch), bbox (B, O, 4)
    out: (B, (c_dim // 8) * 2 * 2) layout code.
    """

    c_dim: int
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, labels: Array, bbox: Array, train: bool) -> Array:
        layout = stn_place_const_multi(labels, bbox, (16, 16))
        x = Conv3x3(self.c_dim // 2, stride=2, kernel_init=self.kernel_init)(layout)
        x = nn.leaky_relu(x, 0.2)
        x = Conv3x3(self.c_dim // 4, stride=2, kernel_init=self.kernel_init)(x)
        x = TorchBatchNorm()(x, train)
        x = nn.leaky_relu(x, 0.2)
        x = Conv3x3(self.c_dim // 8, stride=2, kernel_init=self.kernel_init)(x)
        x = TorchBatchNorm()(x, train)
        x = nn.leaky_relu(x, 0.2)
        # flatten in torch CHW order (reference .view(b, -1) on NCHW) so the
        # downstream fc weights line up with imported checkpoints
        return jnp.transpose(x, (0, 3, 1, 2)).reshape(labels.shape[0], -1)


class ObjectPathwayG(nn.Module):
    """Generator object pathway (model.py:160-169).

    Per object: tile the label vector to 4x4, run two upBlocks (-> 16x16),
    STN-place into the bbox on a 16x16 canvas, sum over objects.

    in: labels (B, O, ef), bbox (B, O, 4) -> (B, 16, 16, ngf // 4)
    """

    ngf: int
    kernel_init: Callable = normal_init()
    canvas_hw: tuple = (16, 16)

    @nn.compact
    def __call__(self, labels: Array, bbox: Array, train: bool) -> Array:
        b, o, ef = labels.shape
        x = labels.reshape(b * o, 1, 1, ef)
        x = jnp.broadcast_to(x, (b * o, 4, 4, ef))
        with object_fold(o):
            x = UpBlock(self.ngf // 2, kernel_init=self.kernel_init)(x, train)
            x = UpBlock(self.ngf // 4, kernel_init=self.kernel_init)(x, train)
        x = x.reshape((b, o) + x.shape[1:])
        return stn_place_multi(x, bbox, self.canvas_hw)


class ObjectPathwayD(nn.Module):
    """Discriminator object pathway (model.py:225-234).

    Per object: STN-extract a 16x16 patch of the image at the bbox, concat
    the tiled label channels, conv4x4(s1, p1) + BN + LeakyReLU (note: the
    conv shrinks 16 -> 15; the STN-place resamples back to 16), place into
    the bbox on a 16x16 canvas, sum over objects.

    in: image (B, H, W, C), labels (B, O, L), bbox (B, O, 4)
    out: (B, 16, 16, ndf * 2)
    """

    ndf: int
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, image: Array, labels: Array, bbox: Array,
                 train: bool) -> Array:
        b, o, l = labels.shape
        patches = stn_extract_multi(image, bbox, (16, 16))   # (B, O, 16, 16, C)
        patches = patches.reshape((b * o,) + patches.shape[2:])
        lab = jnp.broadcast_to(labels.reshape(b * o, 1, 1, l),
                               (b * o, 16, 16, l))
        x = jnp.concatenate([patches, lab], axis=-1)
        with object_fold(o):
            x = conv_dt(self.ndf * 2, (4, 4), strides=(1, 1), padding=1,
                        use_bias=False,
                        kernel_init=self.kernel_init)(x)  # -> 15x15
            x = TorchBatchNorm()(x, train)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape((b, o) + x.shape[1:])
        return stn_place_multi(x, bbox, (16, 16))


class CANet(nn.Module):
    """Conditioning augmentation (stackgan model.py:44-72).

    fc(text_dim -> 2 * c_dim) + ReLU, split mu / logvar, reparametrize.
    attngan (model.py:317-345) uses fc -> 4 * c_dim with GLU instead; select
    with ``use_glu``.
    """

    c_dim: int
    use_glu: bool = False
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, text_embedding: Array,
                 rng: Optional[Array] = None) -> tuple[Array, Array, Array]:
        if self.use_glu:
            x = Dense(self.c_dim * 4, kernel_init=self.kernel_init)(text_embedding)
            a, g = x[..., : self.c_dim * 2], x[..., self.c_dim * 2:]
            x = a * jax.nn.sigmoid(g)
        else:
            x = Dense(self.c_dim * 2, kernel_init=self.kernel_init)(text_embedding)
            x = nn.relu(x)
        mu, logvar = x[..., : self.c_dim], x[..., self.c_dim:]
        if rng is None:
            c_code = mu  # deterministic eval path
        else:
            std = jnp.exp(0.5 * logvar)
            eps = jax.random.normal(rng, std.shape, std.dtype)
            c_code = mu + eps * std
        return c_code, mu, logvar


class DGetLogits(nn.Module):
    """Conditional / unconditional D head (model.py:43-70).

    conditional: tile condition to 4x4, concat with the 4x4 feature map,
    conv3x3 + BN + LeakyReLU + conv4x4/s4 -> one logit per sample.
    unconditional: conv4x4/s4 only.
    """

    ndf: int
    bcondition: bool = True
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, h_code: Array, c_code: Optional[Array] = None,
                 train: bool = True) -> Array:
        if self.bcondition and c_code is not None:
            b, d = c_code.shape
            c = jnp.broadcast_to(c_code.reshape(b, 1, 1, d), (b, 4, 4, d))
            x = jnp.concatenate([h_code, c], axis=-1)
            x = Conv3x3(self.ndf * 8, kernel_init=self.kernel_init)(x)
            x = TorchBatchNorm()(x, train)
            x = nn.leaky_relu(x, 0.2)
        else:
            x = h_code
        x = conv_dt(1, (4, 4), strides=(4, 4), padding=0, use_bias=True,
                    kernel_init=self.kernel_init,
                    bias_init=nn.initializers.zeros)(x)
        return x.reshape(-1)
