"""StackGAN stage-2 (256px) generator and discriminator.

Parity targets:
  * STAGE2_G — code/coco/stackgan/model.py:311-442: frozen stage-1 G
    produces a 64px image (detached), which is encoded to 16x16; c_code and
    an STN label layout (stage-1-scale bboxes) are joined, R_NUM ResBlocks
    run, and an object pathway operating on STAGE-2-scale bboxes
    (extract 16x16 patch of h_code -> two upBlocks -> place on a 64x64
    canvas) merges with the upsampling global pathway to 256px.
  * STAGE2_D — model.py:445-537: 256px D, object pathway at 32x32 with a
    two-conv local block, global conv1-8 to 4x4 x ndf*8, BOTH cond and
    uncond heads.

Functional translation: the frozen stage-1 G is NOT embedded as a submodule;
the caller runs it separately (its params never enter the stage-2 optimizer)
and passes the detached 64px image in — same semantics as the reference's
``stage1_img.detach()`` + requires_grad=False (model.py:317-320,385).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multiple_objects_gan_tpu.models.common import Stage1Config
from multiple_objects_gan_tpu.nn.blocks import (
    conv_dt,
    Conv3x3,
    ResBlock,
    TorchBatchNorm,
    UpBlock,
    normal_init,
    object_fold,
)
from multiple_objects_gan_tpu.nn.pathways import (
    CANet,
    DGetLogits,
    LabelEmbed,
)
from multiple_objects_gan_tpu.ops import (
    stn_extract_multi,
    stn_place_const_multi,
    stn_place_multi,
)

Array = jax.Array

COCO_S2 = dataclasses.replace(
    # stage-2 width: gf_dim used directly (no *8) — model.py:314
    Stage1Config(variant="coco-stackgan-2", img_channels=3, num_objects=3,
                 label_dim=81, condition_dim=128, text_dim=1024,
                 use_label_embed=True, use_ca=True, d_cond_dim=128,
                 use_uncond_head=True),
    gf_dim=192, df_dim=96)

R_NUM_DEFAULT = 2  # cfg/coco_s2_train.yml GAN.R_NUM


class Stage2G(nn.Module):
    """256px generator (stage-1 image supplied by the caller, detached)."""

    cfg: Stage1Config
    r_num: int = R_NUM_DEFAULT

    @nn.compact
    def __call__(self, stage1_img: Array, bbox_s1: Array, bbox_s2: Array,
                 label_onehot: Array, text_embedding: Array, *,
                 train: bool, ca_rng: Optional[Array] = None) -> dict:
        cfg = self.cfg
        ngf, ef = cfg.gf_dim, cfg.condition_dim
        b, o, _ = label_onehot.shape
        stage1_img = jax.lax.stop_gradient(stage1_img)

        # encode 64px stage-1 image to 16x16 x 4ngf (model.py:344-352)
        x = Conv3x3(ngf, name="enc_conv0")(stage1_img)
        x = nn.relu(x)
        x = conv_dt(ngf * 2, (4, 4), strides=(2, 2), padding=1,
                    use_bias=False, kernel_init=normal_init(),
                    name="enc_conv1")(x)
        x = TorchBatchNorm(name="enc_bn1")(x, train)
        x = nn.relu(x)
        x = conv_dt(ngf * 4, (4, 4), strides=(2, 2), padding=1,
                    use_bias=False, kernel_init=normal_init(),
                    name="enc_conv2")(x)
        x = TorchBatchNorm(name="enc_bn2")(x, train)
        encoded_img = nn.relu(x)

        c_code, mu, logvar = CANet(ef, name="ca_net")(text_embedding, ca_rng)

        # per-object labels fc(c || one-hot) (model.py:390-398)
        lab_in = jnp.concatenate(
            [jnp.broadcast_to(c_code[:, None, :], (b, o, ef)), label_onehot],
            axis=-1)
        local_labels = LabelEmbed(ef, name="label")(lab_in, train)

        c_map = jnp.broadcast_to(c_code[:, None, None, :], (b, 16, 16, ef))
        if cfg.use_bbox_layout:
            # label layout placed with STAGE-1-scale bboxes (model.py:393-403)
            labels_layout = stn_place_const_multi(local_labels, bbox_s1,
                                                  (16, 16))
            i_c_code = jnp.concatenate([encoded_img, c_map, labels_layout],
                                       axis=-1)
        else:
            i_c_code = jnp.concatenate([encoded_img, c_map], axis=-1)

        h = Conv3x3(ngf * 4, name="hr_joint_conv")(i_c_code)
        h = TorchBatchNorm(name="hr_joint_bn")(h, train)
        h = nn.relu(h)
        for i in range(self.r_num):
            h = ResBlock(ngf * 4, name=f"residual{i}")(h, train)

        # object pathway on STAGE-2-scale bboxes (model.py:411-429)
        patches = stn_extract_multi(h, bbox_s2, (16, 16))   # (B,O,16,16,4ngf)
        patches = patches.reshape((b * o,) + patches.shape[2:])
        lab_map = jnp.broadcast_to(
            local_labels.reshape(b * o, 1, 1, ef), (b * o, 16, 16, ef))
        cur = jnp.concatenate([patches, lab_map], axis=-1)
        with object_fold(o):
            cur = UpBlock(ngf * 2, name="local1")(cur, train)    # 32x32
            cur = UpBlock(ngf, name="local2")(cur, train)        # 64x64
        cur = cur.reshape((b, o) + cur.shape[1:])
        h_locals = stn_place_multi(cur, bbox_s2, (64, 64))

        # global upsampling (model.py:431-441)
        h = UpBlock(ngf * 2, name="upsample1")(h, train)     # 32x32
        h = UpBlock(ngf, name="upsample2")(h, train)         # 64x64
        h = jnp.concatenate([h, h_locals], axis=-1)          # 2ngf
        h = UpBlock(ngf // 2, name="upsample3")(h, train)    # 128x128
        h = UpBlock(ngf // 4, name="upsample4")(h, train)    # 256x256
        img = jnp.tanh(Conv3x3(cfg.img_channels, name="img")(h))

        return {"img": img, "stage1_img": stage1_img, "mu": mu,
                "logvar": logvar, "local_labels": local_labels}


class Stage2D(nn.Module):
    """256px discriminator with 32x32 object pathway and cond+uncond heads."""

    cfg: Stage1Config

    def setup(self):
        ndf = self.cfg.df_dim
        ki = normal_init()
        self.local_conv1 = conv_dt(ndf * 2, (4, 4), strides=(1, 1), padding=1,
                                   use_bias=False, kernel_init=ki)
        self.local_bn1 = TorchBatchNorm()
        self.local_conv2 = conv_dt(ndf * 2, (4, 4), strides=(1, 1), padding=1,
                                   use_bias=False, kernel_init=ki)
        self.local_bn2 = TorchBatchNorm()
        for i, mult in [(1, 1), (2, 2), (3, 4), (4, 8), (5, 16), (6, 32)]:
            setattr(self, f"conv{i}",
                    conv_dt(ndf * mult, (4, 4), strides=(2, 2), padding=1,
                            use_bias=False, kernel_init=ki))
        self.conv7 = Conv3x3(ndf * 16)
        self.conv8 = Conv3x3(ndf * 8)
        for i in range(2, 9):
            setattr(self, f"bn{i}", TorchBatchNorm())
        self.get_cond_logits = DGetLogits(ndf, bcondition=True)
        self.get_uncond_logits = DGetLogits(ndf, bcondition=False)

    def __call__(self, image: Array, labels: Array, bbox: Array, *,
                 train: bool) -> Array:
        b, o, l = labels.shape
        # object pathway at 32x32 (model.py:486-501)
        patches = stn_extract_multi(image, bbox, (32, 32))
        patches = patches.reshape((b * o,) + patches.shape[2:])
        lab = jnp.broadcast_to(labels.reshape(b * o, 1, 1, l),
                               (b * o, 32, 32, l))
        x = jnp.concatenate([patches, lab], axis=-1)
        with object_fold(o):
            x = nn.leaky_relu(self.local_bn1(self.local_conv1(x), train),
                              0.2)
            x = nn.leaky_relu(self.local_bn2(self.local_conv2(x), train),
                              0.2)
        x = x.reshape((b, o) + x.shape[1:])
        h_locals = stn_place_multi(x, bbox, (32, 32))

        h = nn.leaky_relu(self.conv1(image), 0.2)            # 128
        h = nn.leaky_relu(self.bn2(self.conv2(h), train), 0.2)   # 64
        h = nn.leaky_relu(self.bn3(self.conv3(h), train), 0.2)   # 32
        h = jnp.concatenate([h, h_locals], axis=-1)          # ndf*6
        h = nn.leaky_relu(self.bn4(self.conv4(h), train), 0.2)   # 16
        h = nn.leaky_relu(self.bn5(self.conv5(h), train), 0.2)   # 8
        h = nn.leaky_relu(self.bn6(self.conv6(h), train), 0.2)   # 4
        h = nn.leaky_relu(self.bn7(self.conv7(h), train), 0.2)
        h = nn.leaky_relu(self.bn8(self.conv8(h), train), 0.2)
        return h

    def cond_logits(self, h_code: Array, c_code: Array, *,
                    train: bool) -> Array:
        return self.get_cond_logits(h_code, c_code, train)

    def uncond_logits(self, h_code: Array, *, train: bool) -> Array:
        return self.get_uncond_logits(h_code, None, train)
