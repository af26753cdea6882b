"""Stage-1 (64px) generator and discriminator — one parameterized family.

Parity targets:
  * STAGE1_G — code/multi-mnist/model.py:113-190, code/clevr/model.py:113-192,
    code/coco/stackgan/model.py:147-235
  * STAGE1_D — code/multi-mnist/model.py:193-257, code/clevr/model.py:196-260,
    code/coco/stackgan/model.py:238-307
  * D_GET_LOGITS — model.py:43-70 in each variant

Layout: NHWC. The generator returns a dict so all variants share one
signature (img always; mu/logvar/local_labels when CA/embedding are on).

Note: the reference mnist STAGE1_G defines a ``self.label`` embedding that is
never used in forward (model.py:137-140 vs :163) — a dead module that only
affects the PyTorch state_dict key set. We do not recreate dead parameters;
the checkpoint importer skips those keys instead.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multiple_objects_gan_tpu.models.common import Stage1Config
from multiple_objects_gan_tpu.nn.blocks import (
    conv_dt,
    Conv3x3,
    Dense,
    TorchBatchNorm,
    UpBlock,
)
from multiple_objects_gan_tpu.nn.pathways import (
    CANet,
    DGetLogits,
    LabelEmbed,
    LayoutEncoder,
    ObjectPathwayD,
    ObjectPathwayG,
)

Array = jax.Array


class Stage1G(nn.Module):
    """64px generator: object pathway + layout encoding + global pathway."""

    cfg: Stage1Config

    @nn.compact
    def __call__(self, z: Array, bbox: Array, label_onehot: Array,
                 text_embedding: Optional[Array] = None, *,
                 train: bool, ca_rng: Optional[Array] = None) -> dict:
        cfg = self.cfg
        ngf = cfg.ngf
        b, o, _ = label_onehot.shape

        mu = logvar = c_code = None
        if cfg.use_ca:
            c_code, mu, logvar = CANet(cfg.condition_dim, name="ca_net")(
                text_embedding, ca_rng)

        # per-object label vectors feeding the object pathway + layout encoder
        if cfg.use_ca:
            lab_in = jnp.concatenate(
                [jnp.broadcast_to(c_code[:, None, :], (b, o, cfg.condition_dim)),
                 label_onehot], axis=-1)           # stackgan model.py:203
        else:
            lab_in = label_onehot
        if cfg.use_label_embed:
            local_labels = LabelEmbed(cfg.condition_dim, name="label")(
                lab_in, train)
        else:
            local_labels = label_onehot            # mnist uses raw one-hots

        # local (object) pathway -> (B, 16, 16, ngf/4)
        h_local = ObjectPathwayG(ngf, name="local")(local_labels, bbox, train)

        # global pathway
        parts = [z]
        if cfg.use_ca:
            parts.append(c_code)
        if cfg.use_bbox_layout:
            bbox_code = LayoutEncoder(cfg.condition_dim, name="bbox_net")(
                local_labels, bbox, train)
            parts.append(bbox_code)
        z_c_code = jnp.concatenate(parts, axis=-1)

        h = Dense(ngf * 4 * 4, use_bias=False, name="fc")(z_c_code)
        h = TorchBatchNorm(name="fc_bn")(h, train)
        h = nn.relu(h)
        # reference reshapes CHW (.view(-1, ngf, 4, 4)); keep that feature
        # ordering so imported fc weights line up, then go NHWC
        h = jnp.transpose(h.reshape(b, ngf, 4, 4), (0, 2, 3, 1))
        h = UpBlock(ngf // 2, name="upsample1")(h, train)      # 8x8
        h = UpBlock(ngf // 4, name="upsample2")(h, train)      # 16x16
        h = jnp.concatenate([h, h_local], axis=-1)             # ngf/2 ch
        h = UpBlock(ngf // 8, name="upsample3")(h, train)      # 32x32
        h = UpBlock(ngf // 16, name="upsample4")(h, train)     # 64x64
        img = jnp.tanh(Conv3x3(cfg.img_channels, name="img")(h))

        return {"img": img, "mu": mu, "logvar": logvar,
                "local_labels": local_labels}


class Stage1D(nn.Module):
    """64px discriminator with object pathway + cond/uncond logit heads.

    ``__call__`` returns the 4x4 x ndf*8 feature map; use
    ``apply(..., method="cond_logits")`` / ``"uncond_logits"`` for the heads
    (mirrors the reference's netD / netD.get_cond_logits split so the
    matching-aware loss can reuse features across real/wrong/fake pairs).
    """

    cfg: Stage1Config

    def setup(self):
        cfg = self.cfg
        ndf = cfg.df_dim
        self.local = ObjectPathwayD(ndf)
        self.conv1 = conv_dt(ndf, (4, 4), strides=(2, 2), padding=1,
                             use_bias=False,
                             kernel_init=nn.initializers.normal(0.02))
        self.conv2 = conv_dt(ndf * 2, (4, 4), strides=(2, 2), padding=1,
                             use_bias=False,
                             kernel_init=nn.initializers.normal(0.02))
        self.bn2 = TorchBatchNorm()
        self.conv3 = conv_dt(ndf * 4, (4, 4), strides=(2, 2), padding=1,
                             use_bias=False,
                             kernel_init=nn.initializers.normal(0.02))
        self.bn3 = TorchBatchNorm()
        self.conv4 = conv_dt(ndf * 8, (4, 4), strides=(2, 2), padding=1,
                             use_bias=False,
                             kernel_init=nn.initializers.normal(0.02))
        self.bn4 = TorchBatchNorm()
        self.get_cond_logits = DGetLogits(ndf, bcondition=True)
        if cfg.use_uncond_head:
            self.get_uncond_logits = DGetLogits(ndf, bcondition=False)

    def __call__(self, image: Array, labels: Array, bbox: Array, *,
                 train: bool) -> Array:
        h_local = self.local(image, labels, bbox, train)       # (B,16,16,2ndf)
        h = self.conv1(image)                                  # 32x32
        h = nn.leaky_relu(h, 0.2)
        h = self.conv2(h)                                      # 16x16
        h = self.bn2(h, train)
        h = nn.leaky_relu(h, 0.2)
        h = jnp.concatenate([h, h_local], axis=-1)             # 4ndf ch
        h = self.conv3(h)                                      # 8x8
        h = self.bn3(h, train)
        h = nn.leaky_relu(h, 0.2)
        h = self.conv4(h)                                      # 4x4
        h = self.bn4(h, train)
        h = nn.leaky_relu(h, 0.2)
        return h

    def cond_logits(self, h_code: Array, c_code: Array, *,
                    train: bool) -> Array:
        return self.get_cond_logits(h_code, c_code, train)

    def uncond_logits(self, h_code: Array, *, train: bool) -> Array:
        return self.get_uncond_logits(h_code, None, train)
