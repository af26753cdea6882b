"""End-to-end numerical parity vs a faithful torch replica of the reference.

Strategy: the reference is Python-2/torch-0.4 and cannot run here, so we
rebuild its mnist STAGE1_G (code/multi-mnist/model.py:113-190) in modern
torch with identical structure and state_dict key names (align_corners=True
matches the 0.4-era grid semantics). Random-init it, export the state_dict,
import through io/torch_import, and require the Flax model to reproduce the
torch forward in eval mode. This validates the model math, the NHWC
translation, AND the checkpoint importer in one shot.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multiple_objects_gan_tpu.io.torch_import import import_stage1_g  # noqa: E402
from multiple_objects_gan_tpu.models import common  # noqa: E402
from multiple_objects_gan_tpu.models.stage1 import Stage1G  # noqa: E402
from multiple_objects_gan_tpu.ops import (  # noqa: E402
    transformation_matrix_inverse,
)

MCFG = dataclasses.replace(common.MNIST, gf_dim=8)  # ngf = 64; same structure
NGF = MCFG.ngf


def conv3x3_t(i, o, stride=1):
    return tnn.Conv2d(i, o, 3, stride, 1, bias=False)


def up_block_t(i, o):
    return tnn.Sequential(tnn.Upsample(scale_factor=2, mode="nearest"),
                          conv3x3_t(i, o), tnn.BatchNorm2d(o),
                          tnn.ReLU(True))


def stn_t(image, theta, size):
    grid = F.affine_grid(theta, torch.Size(size), align_corners=True)
    return F.grid_sample(image, grid, align_corners=True,
                         padding_mode="zeros")


class Stage1GTorch(tnn.Module):
    """Replica of code/multi-mnist/model.py:113-190 (mnist: raw one-hots,
    dead `label` module omitted, BBOX_NET input ch = 10)."""

    def __init__(self):
        super().__init__()
        ngf, ef, zdim = NGF, 10, MCFG.z_dim
        cdim = 128
        self.bbox_net = tnn.Module()
        self.bbox_net.encode = tnn.Sequential(
            conv3x3_t(10, cdim // 2, 2), tnn.LeakyReLU(0.2, True),
            conv3x3_t(cdim // 2, cdim // 4, 2), tnn.BatchNorm2d(cdim // 4),
            tnn.LeakyReLU(0.2, True),
            conv3x3_t(cdim // 4, cdim // 8, 2), tnn.BatchNorm2d(cdim // 8),
            tnn.LeakyReLU(0.2, True))
        self.fc = tnn.Sequential(
            tnn.Linear(zdim + 64, ngf * 4 * 4, bias=False),
            tnn.BatchNorm1d(ngf * 4 * 4), tnn.ReLU(True))
        self.local1 = up_block_t(ef, ngf // 2)
        self.local2 = up_block_t(ngf // 2, ngf // 4)
        self.upsample1 = up_block_t(ngf, ngf // 2)
        self.upsample2 = up_block_t(ngf // 2, ngf // 4)
        self.upsample3 = up_block_t(ngf // 2, ngf // 8)
        self.upsample4 = up_block_t(ngf // 8, ngf // 16)
        self.img = tnn.Sequential(conv3x3_t(ngf // 16, 1), tnn.Tanh())

    def forward(self, noise, t_inv, onehot):
        b = noise.shape[0]
        locals_sum = torch.zeros(b, NGF // 4, 16, 16)
        for idx in range(3):
            lab = onehot[:, idx].view(b, 10, 1, 1).repeat(1, 1, 4, 4)
            h = self.local2(self.local1(lab))
            locals_sum = locals_sum + stn_t(h, t_inv[:, idx], h.shape)
        layout = torch.zeros(b, 10, 16, 16)
        for idx in range(3):
            lab = onehot[:, idx].view(b, 10, 1, 1).repeat(1, 1, 16, 16)
            layout = layout + stn_t(lab, t_inv[:, idx], lab.shape)
        bbox_code = self.bbox_net.encode(layout).view(b, -1)
        h = self.fc(torch.cat([noise, bbox_code], 1)).view(b, NGF, 4, 4)
        h = self.upsample2(self.upsample1(h))
        h = torch.cat([h, locals_sum], 1)
        h = self.upsample4(self.upsample3(h))
        return self.img(h)


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for p in module.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    1.0 + 0.2 * torch.rand(m.running_var.shape, generator=g))
                m.weight.copy_(1.0 + 0.05 * torch.randn(m.weight.shape,
                                                        generator=g))
                m.bias.copy_(0.05 * torch.randn(m.bias.shape, generator=g))
    return module


def test_mnist_g_forward_parity_with_torch_replica():
    tg = _randomize(Stage1GTorch(), seed=3)
    tg.eval()

    rng = np.random.RandomState(0)
    b = 3
    z = rng.randn(b, MCFG.z_dim).astype(np.float32)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3))], axis=-1).astype(np.float32)
    onehot = np.zeros((b, 3, 10), np.float32)
    for i in range(b):
        for j in range(3):
            onehot[i, j, rng.randint(10)] = 1.0

    theta = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        want = tg(torch.from_numpy(z), torch.from_numpy(theta),
                  torch.from_numpy(onehot)).numpy()

    # export with reference key names and import into flax
    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    params, stats = import_stage1_g({"netG": sd}, MCFG)

    g = Stage1G(MCFG)
    # init to get the full structure, then overwrite with imported weights
    variables = g.init(jax.random.PRNGKey(0), jnp.asarray(z),
                       jnp.asarray(bbox), jnp.asarray(onehot), None,
                       train=False, ca_rng=None)
    got_tree = jax.tree.structure({"p": variables["params"],
                                   "s": variables["batch_stats"]})
    want_tree = jax.tree.structure({"p": params, "s": stats})
    assert got_tree == want_tree, (
        f"importer key mismatch:\n{got_tree}\nvs\n{want_tree}")

    out = g.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(z), jnp.asarray(bbox), jnp.asarray(onehot),
                  None, train=False, ca_rng=None)
    got = np.asarray(out["img"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4)


# ---------------------------------------------------------------------------
# mnist STAGE1_D parity (object pathway + conv stack + cond head)
# ---------------------------------------------------------------------------

NDF = 8


class Stage1DTorch(tnn.Module):
    """Replica of code/multi-mnist/model.py:193-257 + D_GET_LOGITS :43-70."""

    def __init__(self):
        super().__init__()
        ndf = NDF
        self.local = tnn.Sequential(
            tnn.Conv2d(1 + 10, ndf * 2, 4, 1, 1, bias=False),
            tnn.BatchNorm2d(ndf * 2), tnn.LeakyReLU(0.2, True))
        self.conv1 = tnn.Conv2d(1, ndf, 4, 2, 1, bias=False)
        self.conv2 = tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(ndf * 2)
        self.conv3 = tnn.Conv2d(ndf * 4, ndf * 4, 4, 2, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(ndf * 4)
        self.conv4 = tnn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False)
        self.bn4 = tnn.BatchNorm2d(ndf * 8)
        self.head = tnn.Sequential(
            conv3x3_t(ndf * 8 + 10, ndf * 8), tnn.BatchNorm2d(ndf * 8),
            tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * 8, 1, kernel_size=4, stride=4))
        self.act = tnn.LeakyReLU(0.2, True)

    def forward(self, image, label, t_fwd, t_inv, cond):
        b = image.shape[0]
        locals_sum = torch.zeros(b, NDF * 2, 16, 16)
        for idx in range(3):
            lab = label[:, idx].view(b, 10, 1, 1).repeat(1, 1, 16, 16)
            patch = stn_t(image, t_fwd[:, idx], (b, image.shape[1], 16, 16))
            h = self.local(torch.cat([patch, lab], 1))
            locals_sum = locals_sum + stn_t(h, t_inv[:, idx],
                                            (b, h.shape[1], 16, 16))
        h = self.act(self.conv1(image))
        h = self.act(self.bn2(self.conv2(h)))
        h = torch.cat([h, locals_sum], 1)
        h = self.act(self.bn3(self.conv3(h)))
        h = self.act(self.bn4(self.conv4(h)))
        c = cond.view(b, 10, 1, 1).repeat(1, 1, 4, 4)
        return self.head(torch.cat([h, c], 1)).view(-1)


def test_mnist_d_forward_parity_with_torch_replica():
    from multiple_objects_gan_tpu.models.stage1 import Stage1D
    from multiple_objects_gan_tpu.ops import transformation_matrix

    td = _randomize(Stage1DTorch(), seed=11)
    td.eval()
    rng = np.random.RandomState(5)
    b = 2
    img = rng.randn(b, 1, 64, 64).astype(np.float32).clip(-1, 1)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3))], -1).astype(np.float32)
    onehot = np.zeros((b, 3, 10), np.float32)
    for i in range(b):
        for j in range(3):
            onehot[i, j, rng.randint(10)] = 1.0
    cond = onehot.sum(1)
    t_fwd = np.asarray(transformation_matrix(jnp.asarray(bbox)))
    t_inv = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        want = td(torch.from_numpy(img), torch.from_numpy(onehot),
                  torch.from_numpy(t_fwd), torch.from_numpy(t_inv),
                  torch.from_numpy(cond)).numpy()

    dcfg = dataclasses.replace(common.MNIST, df_dim=NDF)
    d = Stage1D(dcfg)
    # export with the reference's state_dict key names -> importer
    from multiple_objects_gan_tpu.io.torch_import import import_stage1_d
    sd = {k.replace("head.", "get_cond_logits.outlogits."): v.numpy()
          for k, v in td.state_dict().items()}
    params, stats = import_stage1_d(sd, dcfg)

    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    variables = {"params": params, "batch_stats": stats}
    feat = d.apply(variables, img_nhwc, jnp.asarray(onehot),
                   jnp.asarray(bbox), train=False)
    got = d.apply(variables, feat, jnp.asarray(cond), train=False,
                  method="cond_logits")
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


# ---------------------------------------------------------------------------
# stackgan STAGE1_G parity (CA-net mu path + learned label embedding)
# ---------------------------------------------------------------------------

S1CFG = dataclasses.replace(common.COCO_S1, gf_dim=8, text_dim=24,
                            condition_dim=16, d_cond_dim=16)


class StackganG_Torch(tnn.Module):
    """Replica of code/coco/stackgan/model.py:147-235 with c_code = mu
    (deterministic eval path)."""

    def __init__(self):
        super().__init__()
        ngf, ef, zdim = S1CFG.ngf, 16, 100
        self.ca_fc = tnn.Linear(24, ef * 2, bias=True)
        self.label = tnn.Sequential(tnn.Linear(ef + 81, ef, bias=False),
                                    tnn.BatchNorm1d(ef), tnn.ReLU(True))
        self.bbox_net = tnn.Module()
        self.bbox_net.encode = tnn.Sequential(
            conv3x3_t(16, 8, 2), tnn.LeakyReLU(0.2, True),
            conv3x3_t(8, 4, 2), tnn.BatchNorm2d(4), tnn.LeakyReLU(0.2, True),
            conv3x3_t(4, 2, 2), tnn.BatchNorm2d(2), tnn.LeakyReLU(0.2, True))
        self.fc = tnn.Sequential(
            tnn.Linear(zdim + ef + 8, ngf * 16, bias=False),
            tnn.BatchNorm1d(ngf * 16), tnn.ReLU(True))
        self.local1 = up_block_t(ef, ngf // 2)
        self.local2 = up_block_t(ngf // 2, ngf // 4)
        self.upsample1 = up_block_t(ngf, ngf // 2)
        self.upsample2 = up_block_t(ngf // 2, ngf // 4)
        self.upsample3 = up_block_t(ngf // 2, ngf // 8)
        self.upsample4 = up_block_t(ngf // 8, ngf // 16)
        self.img = tnn.Sequential(conv3x3_t(ngf // 16, 3), tnn.Tanh())

    def forward(self, text, noise, t_inv, onehot):
        b = noise.shape[0]
        ngf, ef = S1CFG.ngf, 16
        x = torch.relu(self.ca_fc(text))
        mu = x[:, :ef]
        c = mu  # deterministic
        locals_sum = torch.zeros(b, ngf // 4, 16, 16)
        local_labels = torch.zeros(b, 3, ef)
        for idx in range(3):
            lab = self.label(torch.cat([c, onehot[:, idx]], 1))
            local_labels[:, idx] = lab
            lab4 = lab.view(b, ef, 1, 1).repeat(1, 1, 4, 4)
            h = self.local2(self.local1(lab4))
            locals_sum = locals_sum + stn_t(h, t_inv[:, idx], h.shape)
        layout = torch.zeros(b, ef, 16, 16)
        for idx in range(3):
            lab16 = local_labels[:, idx].view(b, ef, 1, 1).repeat(1, 1, 16, 16)
            layout = layout + stn_t(lab16, t_inv[:, idx], lab16.shape)
        bbox_code = self.bbox_net.encode(layout).view(b, -1)
        h = self.fc(torch.cat([noise, c, bbox_code], 1)).view(b, ngf, 4, 4)
        h = self.upsample2(self.upsample1(h))
        h = torch.cat([h, locals_sum], 1)
        h = self.upsample4(self.upsample3(h))
        return self.img(h)


def test_stackgan_g_forward_parity_with_torch_replica():
    from multiple_objects_gan_tpu.models.stage1 import Stage1G

    tg = _randomize(StackganG_Torch(), seed=21)
    tg.eval()
    rng = np.random.RandomState(2)
    b = 2
    text = rng.randn(b, 24).astype(np.float32)
    z = rng.randn(b, 100).astype(np.float32)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3))], -1).astype(np.float32)
    onehot = np.zeros((b, 3, 81), np.float32)
    for i in range(b):
        for j in range(3):
            onehot[i, j, rng.randint(81)] = 1.0
    theta = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        want = tg(torch.from_numpy(text), torch.from_numpy(z),
                  torch.from_numpy(theta), torch.from_numpy(onehot)).numpy()

    # export with the reference's state_dict key names
    sd = {k.replace("ca_fc", "ca_net.fc"): v.numpy()
          for k, v in tg.state_dict().items()}
    params, stats = import_stage1_g({"netG": sd}, S1CFG)
    g = Stage1G(S1CFG)
    variables = g.init(jax.random.PRNGKey(0), jnp.asarray(z),
                       jnp.asarray(bbox), jnp.asarray(onehot),
                       jnp.asarray(text), train=False, ca_rng=None)
    assert (jax.tree.structure({"p": variables["params"],
                                "s": variables["batch_stats"]})
            == jax.tree.structure({"p": params, "s": stats}))
    out = g.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(z), jnp.asarray(bbox), jnp.asarray(onehot),
                  jnp.asarray(text), train=False, ca_rng=None)
    got = np.asarray(out["img"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-4)


# ---------------------------------------------------------------------------
# CLEVR STAGE1_G parity (learned label embedding, BBOX_NET over embedded
# labels with c_dim = CONDITION_DIM = 16, 4 objects, no CA)
# ---------------------------------------------------------------------------

CLCFG = dataclasses.replace(common.CLEVR, gf_dim=8, df_dim=8)


class ClevrG_Torch(tnn.Module):
    """Replica of code/clevr/model.py:113-192."""

    def __init__(self):
        super().__init__()
        ngf, ef, zdim = CLCFG.ngf, 16, CLCFG.z_dim
        self.label = tnn.Sequential(tnn.Linear(13, ef, bias=False),
                                    tnn.BatchNorm1d(ef), tnn.ReLU(True))
        self.bbox_net = tnn.Module()
        self.bbox_net.encode = tnn.Sequential(
            conv3x3_t(ef, ef // 2, 2), tnn.LeakyReLU(0.2, True),
            conv3x3_t(ef // 2, ef // 4, 2), tnn.BatchNorm2d(ef // 4),
            tnn.LeakyReLU(0.2, True),
            conv3x3_t(ef // 4, ef // 8, 2), tnn.BatchNorm2d(ef // 8),
            tnn.LeakyReLU(0.2, True))
        self.fc = tnn.Sequential(
            tnn.Linear(zdim + 8, ngf * 4 * 4, bias=False),
            tnn.BatchNorm1d(ngf * 4 * 4), tnn.ReLU(True))
        self.local1 = up_block_t(ef, ngf // 2)
        self.local2 = up_block_t(ngf // 2, ngf // 4)
        self.upsample1 = up_block_t(ngf, ngf // 2)
        self.upsample2 = up_block_t(ngf // 2, ngf // 4)
        self.upsample3 = up_block_t(ngf // 2, ngf // 8)
        self.upsample4 = up_block_t(ngf // 8, ngf // 16)
        self.img = tnn.Sequential(conv3x3_t(ngf // 16, 3), tnn.Tanh())

    def forward(self, noise, t_inv, onehot):
        b = noise.shape[0]
        ngf, ef = CLCFG.ngf, 16
        locals_sum = torch.zeros(b, ngf // 4, 16, 16)
        local_labels = torch.zeros(b, 4, ef)
        for idx in range(4):
            lab = self.label(onehot[:, idx])
            local_labels[:, idx] = lab
            lab4 = lab.view(b, ef, 1, 1).repeat(1, 1, 4, 4)
            h = self.local2(self.local1(lab4))
            locals_sum = locals_sum + stn_t(h, t_inv[:, idx], h.shape)
        layout = torch.zeros(b, ef, 16, 16)
        for idx in range(4):
            l16 = local_labels[:, idx].view(b, ef, 1, 1).repeat(1, 1, 16, 16)
            layout = layout + stn_t(l16, t_inv[:, idx], l16.shape)
        bbox_code = self.bbox_net.encode(layout).view(b, -1)
        h = self.fc(torch.cat([noise, bbox_code], 1)).view(b, ngf, 4, 4)
        h = self.upsample2(self.upsample1(h))
        h = torch.cat([h, locals_sum], 1)
        h = self.upsample4(self.upsample3(h))
        return self.img(h)


def test_clevr_g_forward_parity_with_torch_replica():
    tg = _randomize(ClevrG_Torch(), seed=31)
    tg.eval()
    rng = np.random.RandomState(4)
    b = 2
    z = rng.randn(b, CLCFG.z_dim).astype(np.float32)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, 4)),
                     rng.uniform(0.05, 0.5, (b, 4)),
                     rng.uniform(0.2, 0.4, (b, 4)),
                     rng.uniform(0.2, 0.4, (b, 4))], -1).astype(np.float32)
    onehot = np.zeros((b, 4, 13), np.float32)
    for i in range(b):
        for j in range(4):
            onehot[i, j, rng.randint(13)] = 1.0
    theta = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        want = tg(torch.from_numpy(z), torch.from_numpy(theta),
                  torch.from_numpy(onehot)).numpy()

    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    params, stats = import_stage1_g({"netG": sd}, CLCFG)
    g = Stage1G(CLCFG)
    variables = g.init(jax.random.PRNGKey(0), jnp.asarray(z),
                       jnp.asarray(bbox), jnp.asarray(onehot), None,
                       train=False, ca_rng=None)
    assert (jax.tree.structure({"p": variables["params"],
                                "s": variables["batch_stats"]})
            == jax.tree.structure({"p": params, "s": stats}))
    out = g.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(z), jnp.asarray(bbox), jnp.asarray(onehot),
                  None, train=False, ca_rng=None)
    got = np.asarray(out["img"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-4)


# ---------------------------------------------------------------------------
# StackGAN STAGE2_G parity (encoder + hr_joint + ResBlocks + dual-scale
# object pathway + 256px upsampling), through import_stage2_g
# ---------------------------------------------------------------------------

import dataclasses as _dc

from multiple_objects_gan_tpu.models.stage2 import COCO_S2

S2CFG = _dc.replace(COCO_S2, gf_dim=16, df_dim=8, condition_dim=16,
                    text_dim=24, d_cond_dim=16)


class Stage2G_Torch(tnn.Module):
    """Replica of code/coco/stackgan/model.py:311-442 (without the wrapped
    frozen STAGE1_G: the 64px stage-1 image is an input, exactly like our
    Stage2G), c_code = mu (deterministic eval path)."""

    def __init__(self, r_num=2):
        super().__init__()
        ngf, ef = S2CFG.gf_dim, S2CFG.condition_dim
        self.ca_fc = tnn.Linear(24, ef * 2, bias=True)
        self.label = tnn.Sequential(tnn.Linear(ef + 81, ef, bias=False),
                                    tnn.BatchNorm1d(ef), tnn.ReLU(True))
        self.encoder = tnn.Sequential(
            conv3x3_t(3, ngf), tnn.ReLU(True),
            tnn.Conv2d(ngf, ngf * 2, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ngf * 2), tnn.ReLU(True),
            tnn.Conv2d(ngf * 2, ngf * 4, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ngf * 4), tnn.ReLU(True))
        self.hr_joint = tnn.Sequential(
            conv3x3_t(ef * 2 + ngf * 4, ngf * 4),
            tnn.BatchNorm2d(ngf * 4), tnn.ReLU(True))
        blocks = []
        for _ in range(r_num):
            blk = tnn.Module()
            blk.block = tnn.Sequential(
                conv3x3_t(ngf * 4, ngf * 4), tnn.BatchNorm2d(ngf * 4),
                tnn.ReLU(True), conv3x3_t(ngf * 4, ngf * 4),
                tnn.BatchNorm2d(ngf * 4))
            blocks.append(blk)
        self.residual = tnn.ModuleList(blocks)
        self.local1 = up_block_t(ef + ngf * 4, ngf * 2)
        self.local2 = up_block_t(ngf * 2, ngf)
        self.upsample1 = up_block_t(ngf * 4, ngf * 2)
        self.upsample2 = up_block_t(ngf * 2, ngf)
        self.upsample3 = up_block_t(ngf * 2, ngf // 2)
        self.upsample4 = up_block_t(ngf // 2, ngf // 4)
        self.img = tnn.Sequential(conv3x3_t(ngf // 4, 3), tnn.Tanh())

    def forward(self, stage1_img, text, t_s2, t_inv_s1, t_inv_s2, onehot):
        b = stage1_img.shape[0]
        ngf, ef = S2CFG.gf_dim, S2CFG.condition_dim
        encoded = self.encoder(stage1_img)                 # (b, 4ngf, 16, 16)
        x = torch.relu(self.ca_fc(text))
        c_code = x[:, :ef]                                 # mu (deterministic)
        c_map = c_code.view(b, ef, 1, 1).repeat(1, 1, 16, 16)

        local_labels = torch.zeros(b, 3, ef)
        layout = torch.zeros(b, ef, 16, 16)
        for idx in range(3):
            lab = self.label(torch.cat([c_code, onehot[:, idx]], 1))
            local_labels[:, idx] = lab
            l16 = lab.view(b, ef, 1, 1).repeat(1, 1, 16, 16)
            layout = layout + stn_t(l16, t_inv_s1[:, idx], l16.shape)
        h = self.hr_joint(torch.cat([encoded, c_map, layout], 1))
        for blk in self.residual:
            h = torch.relu(blk.block(h) + h)               # ResBlock forward

        h_locals = torch.zeros(b, ngf, 64, 64)
        for idx in range(3):
            l16 = local_labels[:, idx].view(b, ef, 1, 1).repeat(1, 1, 16, 16)
            patch = stn_t(h, t_s2[:, idx], (b, h.shape[1], 16, 16))
            cur = self.local2(self.local1(torch.cat([patch, l16], 1)))
            h_locals = h_locals + stn_t(cur, t_inv_s2[:, idx],
                                        h_locals.shape)

        h = self.upsample2(self.upsample1(h))
        h = torch.cat([h, h_locals], 1)
        h = self.upsample4(self.upsample3(h))
        return self.img(h)


def test_stage2_g_forward_parity_with_torch_replica():
    from multiple_objects_gan_tpu.io.torch_import import import_stage2_g
    from multiple_objects_gan_tpu.models.stage2 import Stage2G
    from multiple_objects_gan_tpu.ops import transformation_matrix

    tg = _randomize(Stage2G_Torch(), seed=51)
    tg.eval()
    rng = np.random.RandomState(8)
    b = 2
    s1_img = rng.randn(b, 3, 64, 64).astype(np.float32).clip(-1, 1)
    text = rng.randn(b, 24).astype(np.float32)
    bb1 = np.stack([rng.uniform(0.05, 0.5, (b, 3)),
                    rng.uniform(0.05, 0.5, (b, 3)),
                    rng.uniform(0.2, 0.4, (b, 3)),
                    rng.uniform(0.2, 0.4, (b, 3))], -1).astype(np.float32)
    bb2 = np.stack([rng.uniform(0.05, 0.5, (b, 3)),
                    rng.uniform(0.05, 0.5, (b, 3)),
                    rng.uniform(0.2, 0.4, (b, 3)),
                    rng.uniform(0.2, 0.4, (b, 3))], -1).astype(np.float32)
    onehot = np.zeros((b, 3, 81), np.float32)
    for i in range(b):
        for j in range(3):
            onehot[i, j, rng.randint(81)] = 1.0
    t_s2 = np.asarray(transformation_matrix(jnp.asarray(bb2)))
    t_inv_s1 = np.asarray(transformation_matrix_inverse(jnp.asarray(bb1)))
    t_inv_s2 = np.asarray(transformation_matrix_inverse(jnp.asarray(bb2)))
    with torch.no_grad():
        want = tg(torch.from_numpy(s1_img), torch.from_numpy(text),
                  torch.from_numpy(t_s2), torch.from_numpy(t_inv_s1),
                  torch.from_numpy(t_inv_s2), torch.from_numpy(onehot)
                  ).numpy()

    sd = {k.replace("ca_fc", "ca_net.fc"): v.numpy()
          for k, v in tg.state_dict().items()}
    _, (params, stats) = import_stage2_g({"netG": sd}, None, S2CFG, r_num=2)
    g2 = Stage2G(S2CFG, r_num=2)
    s1_nhwc = jnp.asarray(s1_img.transpose(0, 2, 3, 1))
    variables = g2.init(jax.random.PRNGKey(0), s1_nhwc, jnp.asarray(bb1),
                        jnp.asarray(bb2), jnp.asarray(onehot),
                        jnp.asarray(text), train=False, ca_rng=None)
    assert (jax.tree.structure({"p": variables["params"],
                                "s": variables["batch_stats"]})
            == jax.tree.structure({"p": params, "s": stats}))
    out = g2.apply({"params": params, "batch_stats": stats}, s1_nhwc,
                   jnp.asarray(bb1), jnp.asarray(bb2), jnp.asarray(onehot),
                   jnp.asarray(text), train=False, ca_rng=None)
    got = np.asarray(out["img"]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-4)


# ---------------------------------------------------------------------------
# CLEVR STAGE1_D parity (3+13 local conv, 4 objects, 13-dim cond head)
# ---------------------------------------------------------------------------

class ClevrD_Torch(tnn.Module):
    """Replica of code/clevr/model.py:196-260 + D_GET_LOGITS :43-70."""

    def __init__(self):
        super().__init__()
        ndf = NDF
        self.local = tnn.Sequential(
            tnn.Conv2d(3 + 13, ndf * 2, 4, 1, 1, bias=False),
            tnn.BatchNorm2d(ndf * 2), tnn.LeakyReLU(0.2, True))
        self.conv1 = tnn.Conv2d(3, ndf, 4, 2, 1, bias=False)
        self.conv2 = tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(ndf * 2)
        self.conv3 = tnn.Conv2d(ndf * 4, ndf * 4, 4, 2, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(ndf * 4)
        self.conv4 = tnn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False)
        self.bn4 = tnn.BatchNorm2d(ndf * 8)
        self.head = tnn.Sequential(
            conv3x3_t(ndf * 8 + 13, ndf * 8), tnn.BatchNorm2d(ndf * 8),
            tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * 8, 1, kernel_size=4, stride=4))
        self.act = tnn.LeakyReLU(0.2, True)

    def forward(self, image, label, t_fwd, t_inv, cond):
        b = image.shape[0]
        locals_sum = torch.zeros(b, NDF * 2, 16, 16)
        for idx in range(4):
            lab = label[:, idx].view(b, 13, 1, 1).repeat(1, 1, 16, 16)
            patch = stn_t(image, t_fwd[:, idx], (b, image.shape[1], 16, 16))
            h = self.local(torch.cat([patch, lab], 1))
            locals_sum = locals_sum + stn_t(h, t_inv[:, idx],
                                            (b, h.shape[1], 16, 16))
        h = self.act(self.conv1(image))
        h = self.act(self.bn2(self.conv2(h)))
        h = torch.cat([h, locals_sum], 1)
        h = self.act(self.bn3(self.conv3(h)))
        h = self.act(self.bn4(self.conv4(h)))
        c = cond.view(b, 13, 1, 1).repeat(1, 1, 4, 4)
        return self.head(torch.cat([h, c], 1)).view(-1)


def test_clevr_d_forward_parity_with_torch_replica():
    from multiple_objects_gan_tpu.models.stage1 import Stage1D
    from multiple_objects_gan_tpu.ops import transformation_matrix

    td = _randomize(ClevrD_Torch(), seed=41)
    td.eval()
    rng = np.random.RandomState(6)
    b = 2
    img = rng.randn(b, 3, 64, 64).astype(np.float32).clip(-1, 1)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, 4)),
                     rng.uniform(0.05, 0.5, (b, 4)),
                     rng.uniform(0.2, 0.4, (b, 4)),
                     rng.uniform(0.2, 0.4, (b, 4))], -1).astype(np.float32)
    onehot = np.zeros((b, 4, 13), np.float32)
    for i in range(b):
        for j in range(4):
            onehot[i, j, rng.randint(13)] = 1.0
    # condition = clamped label sum (code/clevr/miscc/utils.py:98-99)
    cond = onehot.sum(1).clip(0.0, 1.0)
    t_fwd = np.asarray(transformation_matrix(jnp.asarray(bbox)))
    t_inv = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        want = td(torch.from_numpy(img), torch.from_numpy(onehot),
                  torch.from_numpy(t_fwd), torch.from_numpy(t_inv),
                  torch.from_numpy(cond)).numpy()

    d = Stage1D(CLCFG)
    from multiple_objects_gan_tpu.io.torch_import import import_stage1_d
    sd = {k.replace("head.", "get_cond_logits.outlogits."): v.numpy()
          for k, v in td.state_dict().items()}
    params, stats = import_stage1_d(sd, CLCFG)

    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    variables = {"params": params, "batch_stats": stats}
    feat = d.apply(variables, img_nhwc, jnp.asarray(onehot),
                   jnp.asarray(bbox), train=False)
    got = d.apply(variables, feat, jnp.asarray(cond), train=False,
                  method="cond_logits")
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)


def test_warm_start_from_pth_files(tmp_path):
    """NET_G/NET_D .pth warm-start IO path (reference load_network_stageI,
    code/multi-mnist/trainer.py:59-68; netG saved under 'netG', netD bare)."""
    from multiple_objects_gan_tpu.io.torch_import import (
        maybe_load_reference_d, maybe_load_reference_g)
    from multiple_objects_gan_tpu.models.stage1 import Stage1D
    from multiple_objects_gan_tpu.train.step import create_state

    tg = _randomize(Stage1GTorch(), seed=13)
    td = _randomize(Stage1DTorch(), seed=17)
    g_path, d_path = tmp_path / "netG.pth", tmp_path / "netD.pth"
    torch.save({"netG": tg.state_dict()}, g_path)
    torch.save({k.replace("head.", "get_cond_logits.outlogits."): v
                for k, v in td.state_dict().items()}, d_path)

    dcfg = dataclasses.replace(MCFG, df_dim=NDF)
    state = create_state(dcfg, Stage1G(dcfg), Stage1D(dcfg),
                         jax.random.PRNGKey(0), batch_size=2)
    state = maybe_load_reference_g(str(g_path), dcfg, state)
    assert state is not None
    state = maybe_load_reference_d(str(d_path), dcfg, state)
    assert state is not None
    np.testing.assert_allclose(
        np.asarray(state.g_params["img"]["Conv_0"]["kernel"]),
        tg.state_dict()["img.0.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(state.d_params["conv1"]["kernel"]),
        td.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0))
    # missing path -> None (caller keeps random init)
    assert maybe_load_reference_d(str(tmp_path / "nope.pth"), dcfg,
                                  state) is None


# ---------------------------------------------------------------------------
# StackGAN STAGE2_D parity (32x32 two-conv object pathway, conv1-8 stack,
# cond + uncond heads), through import_stage2_d
# ---------------------------------------------------------------------------

class Stage2D_Torch(tnn.Module):
    """Replica of code/coco/stackgan/model.py:445-537."""

    def __init__(self):
        super().__init__()
        ndf, nef = S2CFG.df_dim, S2CFG.condition_dim
        self.local = tnn.Sequential(
            tnn.Conv2d(3 + 81, ndf * 2, 4, 1, 1, bias=False),
            tnn.BatchNorm2d(ndf * 2), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * 2, ndf * 2, 4, 1, 1, bias=False),
            tnn.BatchNorm2d(ndf * 2), tnn.LeakyReLU(0.2, True))
        self.conv1 = tnn.Conv2d(3, ndf, 4, 2, 1, bias=False)
        self.conv2 = tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(ndf * 2)
        self.conv3 = tnn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(ndf * 4)
        self.conv4 = tnn.Conv2d(ndf * 6, ndf * 8, 4, 2, 1, bias=False)
        self.bn4 = tnn.BatchNorm2d(ndf * 8)
        self.conv5 = tnn.Conv2d(ndf * 8, ndf * 16, 4, 2, 1, bias=False)
        self.bn5 = tnn.BatchNorm2d(ndf * 16)
        self.conv6 = tnn.Conv2d(ndf * 16, ndf * 32, 4, 2, 1, bias=False)
        self.bn6 = tnn.BatchNorm2d(ndf * 32)
        self.conv7 = conv3x3_t(ndf * 32, ndf * 16)
        self.bn7 = tnn.BatchNorm2d(ndf * 16)
        self.conv8 = conv3x3_t(ndf * 16, ndf * 8)
        self.bn8 = tnn.BatchNorm2d(ndf * 8)
        self.cond_head = tnn.Sequential(
            conv3x3_t(ndf * 8 + nef, ndf * 8), tnn.BatchNorm2d(ndf * 8),
            tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * 8, 1, kernel_size=4, stride=4))
        self.uncond_head = tnn.Conv2d(ndf * 8, 1, kernel_size=4, stride=4)
        self.act = tnn.LeakyReLU(0.2, True)

    def forward(self, image, label, t_fwd, t_inv, cond):
        b = image.shape[0]
        ndf, nef = S2CFG.df_dim, S2CFG.condition_dim
        locals_sum = torch.zeros(b, ndf * 2, 32, 32)
        for idx in range(3):
            lab = label[:, idx].view(b, 81, 1, 1).repeat(1, 1, 32, 32)
            patch = stn_t(image, t_fwd[:, idx], (b, 3, 32, 32))
            h = self.local(torch.cat([patch, lab], 1))
            locals_sum = locals_sum + stn_t(h, t_inv[:, idx],
                                            (b, h.shape[1], 32, 32))
        h = self.act(self.conv1(image))
        h = self.act(self.bn2(self.conv2(h)))
        h = self.act(self.bn3(self.conv3(h)))
        h = torch.cat([h, locals_sum], 1)
        h = self.act(self.bn4(self.conv4(h)))
        h = self.act(self.bn5(self.conv5(h)))
        h = self.act(self.bn6(self.conv6(h)))
        h = self.act(self.bn7(self.conv7(h)))
        h = self.act(self.bn8(self.conv8(h)))
        c = cond.view(b, nef, 1, 1).repeat(1, 1, 4, 4)
        return (self.cond_head(torch.cat([h, c], 1)).view(-1),
                self.uncond_head(h).view(-1))


def test_stage2_d_forward_parity_with_torch_replica():
    from multiple_objects_gan_tpu.io.torch_import import import_stage2_d
    from multiple_objects_gan_tpu.models.stage2 import Stage2D
    from multiple_objects_gan_tpu.ops import transformation_matrix

    td = _randomize(Stage2D_Torch(), seed=81)
    td.eval()
    rng = np.random.RandomState(10)
    b = 2
    img = rng.randn(b, 3, 256, 256).astype(np.float32).clip(-1, 1)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3))], -1).astype(np.float32)
    onehot = np.zeros((b, 3, 81), np.float32)
    for i in range(b):
        for j in range(3):
            onehot[i, j, rng.randint(81)] = 1.0
    cond = rng.randn(b, S2CFG.condition_dim).astype(np.float32)  # = mu
    t_fwd = np.asarray(transformation_matrix(jnp.asarray(bbox)))
    t_inv = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        want_c, want_u = td(torch.from_numpy(img), torch.from_numpy(onehot),
                            torch.from_numpy(t_fwd), torch.from_numpy(t_inv),
                            torch.from_numpy(cond))

    # NB: rename uncond first — "cond_head." is a substring of it
    sd = {k.replace("uncond_head.", "get_uncond_logits.outlogits.0.")
           .replace("cond_head.", "get_cond_logits.outlogits."): v
          for k, v in td.state_dict().items()}
    params, stats = import_stage2_d(sd)

    d = Stage2D(S2CFG)
    variables = {"params": params, "batch_stats": stats}
    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    h = d.apply(variables, img_nhwc, jnp.asarray(onehot), jnp.asarray(bbox),
                train=False)
    got_c = d.apply(variables, h, jnp.asarray(cond), train=False,
                    method="cond_logits")
    got_u = d.apply(variables, h, train=False, method="uncond_logits")
    np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_u), want_u.numpy(), atol=5e-4)


# ---------------------------------------------------------------------------
# stackgan STAGE1_D parity (3+81 local pathway, cond head fed with mu)
# ---------------------------------------------------------------------------

class StackganD_Torch(tnn.Module):
    """Replica of code/coco/stackgan/model.py:238-307 + D_GET_LOGITS
    :74-104 (nef = CONDITION_DIM; get_uncond_logits is None in stage 1)."""

    def __init__(self):
        super().__init__()
        ndf, nef = NDF, S1CFG.condition_dim
        self.local = tnn.Sequential(
            tnn.Conv2d(3 + 81, ndf * 2, 4, 1, 1, bias=False),
            tnn.BatchNorm2d(ndf * 2), tnn.LeakyReLU(0.2, True))
        self.conv1 = tnn.Conv2d(3, ndf, 4, 2, 1, bias=False)
        self.conv2 = tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(ndf * 2)
        self.conv3 = tnn.Conv2d(ndf * 4, ndf * 4, 4, 2, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(ndf * 4)
        self.conv4 = tnn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False)
        self.bn4 = tnn.BatchNorm2d(ndf * 8)
        self.head = tnn.Sequential(
            conv3x3_t(ndf * 8 + nef, ndf * 8), tnn.BatchNorm2d(ndf * 8),
            tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * 8, 1, kernel_size=4, stride=4))
        self.act = tnn.LeakyReLU(0.2, True)

    def forward(self, image, label, t_fwd, t_inv, cond):
        b = image.shape[0]
        locals_sum = torch.zeros(b, NDF * 2, 16, 16)
        for idx in range(3):
            lab = label[:, idx].view(b, 81, 1, 1).repeat(1, 1, 16, 16)
            patch = stn_t(image, t_fwd[:, idx], (b, image.shape[1], 16, 16))
            h = self.local(torch.cat([patch, lab], 1))
            locals_sum = locals_sum + stn_t(h, t_inv[:, idx],
                                            (b, h.shape[1], 16, 16))
        h = self.act(self.conv1(image))
        h = self.act(self.bn2(self.conv2(h)))
        h = torch.cat([h, locals_sum], 1)
        h = self.act(self.bn3(self.conv3(h)))
        h = self.act(self.bn4(self.conv4(h)))
        c = cond.view(b, S1CFG.condition_dim, 1, 1).repeat(1, 1, 4, 4)
        return self.head(torch.cat([h, c], 1)).view(-1)


def test_stackgan_d_forward_parity_with_torch_replica():
    from multiple_objects_gan_tpu.io.torch_import import import_stage1_d
    from multiple_objects_gan_tpu.models.stage1 import Stage1D
    from multiple_objects_gan_tpu.ops import transformation_matrix

    td = _randomize(StackganD_Torch(), seed=51)
    td.eval()
    rng = np.random.RandomState(8)
    b = 2
    img = rng.randn(b, 3, 64, 64).astype(np.float32).clip(-1, 1)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3))], -1).astype(np.float32)
    onehot = np.zeros((b, 3, 81), np.float32)
    for i in range(b):
        for j in range(3):
            onehot[i, j, rng.randint(81)] = 1.0
    # the cond head is fed mu from the CA-net (trainer.py:211)
    cond = rng.randn(b, S1CFG.condition_dim).astype(np.float32)
    t_fwd = np.asarray(transformation_matrix(jnp.asarray(bbox)))
    t_inv = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        want = td(torch.from_numpy(img), torch.from_numpy(onehot),
                  torch.from_numpy(t_fwd), torch.from_numpy(t_inv),
                  torch.from_numpy(cond)).numpy()

    dcfg = dataclasses.replace(S1CFG, df_dim=NDF)
    d = Stage1D(dcfg)
    sd = {k.replace("head.", "get_cond_logits.outlogits."): v.numpy()
          for k, v in td.state_dict().items()}
    params, stats = import_stage1_d(sd, dcfg)

    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    variables = {"params": params, "batch_stats": stats}
    feat = d.apply(variables, img_nhwc, jnp.asarray(onehot),
                   jnp.asarray(bbox), train=False)
    got = d.apply(variables, feat, jnp.asarray(cond), train=False,
                  method="cond_logits")
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4)
