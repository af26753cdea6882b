"""AttnGAN multi-stage generator and per-scale discriminators.

Parity targets (code/coco/attngan/model.py):
  * CA_NET (:317-345): fc -> 4*c_dim with GLU, c_dim = 100
  * BBOX_NET (:84-116): layout code 48 (c_dim=100 -> (100//8)*2*2 = 48)
  * INIT_STAGE_G (:348-422): object pathway (label = fc(c || one-hot(81))),
    layout code, fc(z || c || bbox) with GLU, 4 upBlocks to 64px;
    object/global merge at 16x16
  * NEXT_STAGE_G (:425-461): word attention (ATT_NET) + R_NUM GLU ResBlocks
    + upBlock (64->128->256)
  * GET_IMAGE_G (:464-475), G_NET (:478-528) composing per TREE.BRANCH_NUM
  * D_NET64 (:646-711, with object pathway), D_NET128/256 (:715-760, plain),
    D_GET_LOGITS (:616-642, Sigmoid inside -> losses use plain BCE)
  * G_DCGAN (:531-571): single-image-head ablation (its INIT_STAGE_G call is
    broken upstream; we wire it correctly)

attngan init is orthogonal for convs/linears (miscc/utils.py:321-331).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multiple_objects_gan_tpu.nn.attention import GlobalAttention
from multiple_objects_gan_tpu.nn.blocks import (
    conv_dt,
    Block3x3LeakReLU,
    Conv3x3,
    DownBlock,
    EncodeImageBy16Times,
    ResBlockGLU,
    TorchBatchNorm,
    UpBlockGLU,
    glu,
    object_fold,
    orthogonal_init,
)
from multiple_objects_gan_tpu.nn.pathways import CANet, LayoutEncoder
from multiple_objects_gan_tpu.ops import stn_extract_multi, stn_place_multi

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AttnGanConfig:
    gf_dim: int = 48           # cfg/coco_train.yml GAN.GF_DIM
    df_dim: int = 96
    z_dim: int = 100
    condition_dim: int = 100   # GAN.CONDITION_DIM
    embedding_dim: int = 256   # TEXT.EMBEDDING_DIM (nef)
    label_dim: int = 81
    num_objects: int = 3       # MAX_OBJECTS (model.py:14)
    branch_num: int = 3        # TREE.BRANCH_NUM
    r_num: int = 3             # GAN.R_NUM
    b_dcgan: bool = False


COCO_ATTN = AttnGanConfig()


class ObjectPathwayGLU(nn.Module):
    """INIT_STAGE_G object pathway with GLU upBlocks (model.py:399-410)."""

    ngf: int

    @nn.compact
    def __call__(self, labels: Array, bbox: Array, train: bool) -> Array:
        b, o, ef = labels.shape
        x = jnp.broadcast_to(labels.reshape(b * o, 1, 1, ef),
                             (b * o, 4, 4, ef))
        with object_fold(o):
            x = UpBlockGLU(self.ngf // 2, name="local1")(x, train)
            x = UpBlockGLU(self.ngf // 4, name="local2")(x, train)
        x = x.reshape((b, o) + x.shape[1:])
        return stn_place_multi(x, bbox, (16, 16))


class InitStageG(nn.Module):
    """64px stage (model.py:348-422). ngf here = GF_DIM * 16."""

    cfg: AttnGanConfig

    @nn.compact
    def __call__(self, z_code: Array, c_code: Array, bbox: Array,
                 label_onehot: Array, *, train: bool) -> Array:
        cfg = self.cfg
        ngf = cfg.gf_dim * 16
        ef = cfg.condition_dim       # 100 (self.ef_dim, model.py:361)
        b, o, _ = label_onehot.shape

        lab_in = jnp.concatenate(
            [jnp.broadcast_to(c_code[:, None, :], (b, o, ef)), label_onehot],
            axis=-1)
        flat = lab_in.reshape(b * o, -1)
        with object_fold(o):
            flat = nn.Dense(ef, use_bias=False,
                            kernel_init=orthogonal_init(),
                            name="label_fc")(flat)
            flat = TorchBatchNorm(name="label_bn")(flat, train)
        local_labels = nn.relu(flat).reshape(b, o, ef)

        h_locals = ObjectPathwayGLU(ngf, name="local")(local_labels, bbox,
                                                       train)
        bbox_code = LayoutEncoder(ef, kernel_init=orthogonal_init(),
                                  name="bbox_net")(local_labels, bbox, train)

        c_z = jnp.concatenate([c_code, z_code, bbox_code], axis=-1)
        h = nn.Dense(ngf * 4 * 4 * 2, use_bias=False,
                     kernel_init=orthogonal_init(), name="fc")(c_z)
        h = TorchBatchNorm(name="fc_bn")(h, train)
        h = glu(h)
        # torch .view(-1, ngf, 4, 4): CHW feature order (checkpoint parity)
        h = jnp.transpose(h.reshape(b, ngf, 4, 4), (0, 2, 3, 1))
        h = UpBlockGLU(ngf // 2, name="upsample1")(h, train)    # 8x8
        h = UpBlockGLU(ngf // 4, name="upsample2")(h, train)    # 16x16
        h = jnp.concatenate([h, h_locals], axis=-1)             # ngf/2
        h = UpBlockGLU(ngf // 8, name="upsample3")(h, train)    # 32x32
        h = UpBlockGLU(ngf // 16, name="upsample4")(h, train)   # 64x64
        return h                                                # (B,64,64,gf)


class NextStageG(nn.Module):
    """Word-attention stage (model.py:425-461). ngf = GF_DIM."""

    cfg: AttnGanConfig

    @nn.compact
    def __call__(self, h_code: Array, word_embs: Array, mask: Array, *,
                 train: bool) -> tuple[Array, Array]:
        ngf = self.cfg.gf_dim
        context, att = GlobalAttention(ngf, name="att")(h_code, word_embs,
                                                        mask)
        h = jnp.concatenate([h_code, context], axis=-1)         # 2ngf
        for i in range(self.cfg.r_num):
            h = ResBlockGLU(ngf * 2, name=f"residual{i}")(h, train)
        h = UpBlockGLU(ngf, name="upsample")(h, train)
        return h, att


class GetImageG(nn.Module):
    """h_code -> 3ch tanh image (model.py:464-475)."""

    @nn.compact
    def __call__(self, h_code: Array) -> Array:
        return jnp.tanh(Conv3x3(3, kernel_init=orthogonal_init(),
                                name="img")(h_code))


class GNet(nn.Module):
    """Full AttnGAN generator (model.py:478-528)."""

    cfg: AttnGanConfig

    @nn.compact
    def __call__(self, z_code: Array, sent_emb: Array, word_embs: Array,
                 mask: Array, bbox: Array, label_onehot: Array, *,
                 train: bool, ca_rng: Optional[Array] = None) -> dict:
        cfg = self.cfg
        c_code, mu, logvar = CANet(cfg.condition_dim, use_glu=True,
                                   kernel_init=orthogonal_init(),
                                   name="ca_net")(sent_emb, ca_rng)
        fake_imgs, att_maps = [], []
        h = InitStageG(cfg, name="h_net1")(z_code, c_code, bbox,
                                           label_onehot, train=train)
        fake_imgs.append(GetImageG(name="img_net1")(h))
        if cfg.branch_num > 1:
            h, att1 = NextStageG(cfg, name="h_net2")(h, word_embs, mask,
                                                     train=train)
            fake_imgs.append(GetImageG(name="img_net2")(h))
            att_maps.append(att1)
        if cfg.branch_num > 2:
            h, att2 = NextStageG(cfg, name="h_net3")(h, word_embs, mask,
                                                     train=train)
            fake_imgs.append(GetImageG(name="img_net3")(h))
            att_maps.append(att2)
        if cfg.b_dcgan:
            fake_imgs = [fake_imgs[-1]]  # single-head ablation (G_DCGAN)
        return {"imgs": fake_imgs, "att_maps": att_maps, "mu": mu,
                "logvar": logvar}


class DNet64(nn.Module):
    """64px D WITH object pathway (model.py:646-711)."""

    cfg: AttnGanConfig
    b_jcu: bool = True

    def setup(self):
        ndf = self.cfg.df_dim
        ki = orthogonal_init()
        self.conv1 = conv_dt(ndf, (4, 4), strides=(2, 2), padding=1,
                             use_bias=False, kernel_init=ki)
        self.conv2 = conv_dt(ndf * 2, (4, 4), strides=(2, 2), padding=1,
                             use_bias=False, kernel_init=ki)
        self.bn2 = TorchBatchNorm()
        self.conv3 = conv_dt(ndf * 4, (4, 4), strides=(2, 2), padding=1,
                             use_bias=False, kernel_init=ki)
        self.bn3 = TorchBatchNorm()
        self.conv4 = conv_dt(ndf * 8, (4, 4), strides=(2, 2), padding=1,
                             use_bias=False, kernel_init=ki)
        self.bn4 = TorchBatchNorm()
        self.local_conv = conv_dt(ndf * 2, (4, 4), strides=(1, 1), padding=1,
                                  use_bias=False, kernel_init=ki)
        self.local_bn = TorchBatchNorm()
        self.cond_head = AttnDGetLogits(self.cfg, bcondition=True)
        if self.b_jcu:
            self.uncond_head = AttnDGetLogits(self.cfg, bcondition=False)

    def __call__(self, image: Array, labels: Array, bbox: Array, *,
                 train: bool) -> Array:
        b, o, l = labels.shape
        patches = stn_extract_multi(image, bbox, (16, 16))
        patches = patches.reshape((b * o,) + patches.shape[2:])
        lab = jnp.broadcast_to(labels.reshape(b * o, 1, 1, l),
                               (b * o, 16, 16, l))
        x = jnp.concatenate([patches, lab], axis=-1)
        with object_fold(o):
            x = nn.leaky_relu(self.local_bn(self.local_conv(x), train), 0.2)
        x = x.reshape((b, o) + x.shape[1:])
        h_locals = stn_place_multi(x, bbox, (16, 16))

        h = nn.leaky_relu(self.conv1(image), 0.2)             # 32
        h = nn.leaky_relu(self.bn2(self.conv2(h), train), 0.2)  # 16
        h = jnp.concatenate([h, h_locals], axis=-1)
        h = nn.leaky_relu(self.bn3(self.conv3(h), train), 0.2)  # 8
        h = nn.leaky_relu(self.bn4(self.conv4(h), train), 0.2)  # 4
        return h

    def cond_logits(self, h, c, *, train: bool):
        return self.cond_head(h, c, train)

    def uncond_logits(self, h, *, train: bool):
        return self.uncond_head(h, None, train)


class AttnDGetLogits(nn.Module):
    """attngan D head WITH Sigmoid (model.py:616-642) — outputs
    probabilities, losses use plain BCE."""

    cfg: AttnGanConfig
    bcondition: bool = False

    @nn.compact
    def __call__(self, h_code: Array, c_code: Optional[Array],
                 train: bool) -> Array:
        ndf = self.cfg.df_dim
        x = h_code
        if self.bcondition and c_code is not None:
            b, d = c_code.shape
            c = jnp.broadcast_to(c_code.reshape(b, 1, 1, d), (b, 4, 4, d))
            x = jnp.concatenate([x, c], axis=-1)
            x = Block3x3LeakReLU(ndf * 8, name="jointConv")(x, train)
        x = conv_dt(1, (4, 4), strides=(4, 4), padding=0, use_bias=True,
                    kernel_init=orthogonal_init(), name="outlogits")(x)
        return jax.nn.sigmoid(x).reshape(-1)


class DNetScale(nn.Module):
    """D_NET128 / D_NET256 (no object pathway, model.py:715-760).

    scale: 128 or 256.
    """

    cfg: AttnGanConfig
    scale: int = 128
    b_jcu: bool = True

    def setup(self):
        ndf = self.cfg.df_dim
        self.img_code_s16 = EncodeImageBy16Times(ndf)
        self.img_code_s32 = DownBlock(ndf * 16)
        if self.scale == 128:
            self.img_code_s32_1 = Block3x3LeakReLU(ndf * 8)
        else:
            self.img_code_s64 = DownBlock(ndf * 32)
            self.img_code_s64_1 = Block3x3LeakReLU(ndf * 16)
            self.img_code_s64_2 = Block3x3LeakReLU(ndf * 8)
        self.cond_head = AttnDGetLogits(self.cfg, bcondition=True)
        if self.b_jcu:
            self.uncond_head = AttnDGetLogits(self.cfg, bcondition=False)

    def __call__(self, image: Array, labels=None, bbox=None, *,
                 train: bool) -> Array:
        h = self.img_code_s16(image, train)
        h = self.img_code_s32(h, train)
        if self.scale == 128:
            h = self.img_code_s32_1(h, train)
        else:
            h = self.img_code_s64(h, train)
            h = self.img_code_s64_1(h, train)
            h = self.img_code_s64_2(h, train)
        return h

    def cond_logits(self, h, c, *, train: bool):
        return self.cond_head(h, c, train)

    def uncond_logits(self, h, *, train: bool):
        return self.uncond_head(h, None, train)
