"""Value-level parity: Flax GNet vs a modern-torch replica of the reference
AttnGAN generator (code/coco/attngan/model.py:348-528 + GlobalAttention.py).

Batch size 1 is used so the reference's attention-mask indexing (which
misaligns across batch elements upstream — see nn/attention.py docstring)
is equivalent to our per-sample masking. CA-net runs deterministically
(c = mu). Weights flow through io/torch_import.import_attngan_g, so this
also value-tests the checkpoint importer.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multiple_objects_gan_tpu.io.torch_import import import_attngan_g  # noqa: E402
from multiple_objects_gan_tpu.models.attngan import COCO_ATTN, GNet  # noqa: E402
from multiple_objects_gan_tpu.ops import transformation_matrix_inverse  # noqa: E402

CFG = dataclasses.replace(COCO_ATTN, gf_dim=4, df_dim=4, condition_dim=8,
                          embedding_dim=8, branch_num=2, r_num=1)
T = 5
NO = 3  # MAX_OBJECTS


def conv3x3_t(i, o, stride=1):
    return tnn.Conv2d(i, o, 3, stride, 1, bias=False)


class GLU_T(tnn.Module):
    def forward(self, x):
        c = x.size(1)
        return x[:, : c // 2] * torch.sigmoid(x[:, c // 2:])


def up_block_glu(i, o):
    return tnn.Sequential(tnn.Upsample(scale_factor=2, mode="nearest"),
                          conv3x3_t(i, o * 2), tnn.BatchNorm2d(o * 2),
                          GLU_T())


class ResBlockGLU_T(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.block = tnn.Sequential(
            conv3x3_t(ch, ch * 2), tnn.BatchNorm2d(ch * 2), GLU_T(),
            conv3x3_t(ch, ch), tnn.BatchNorm2d(ch))

    def forward(self, x):
        return x + self.block(x)


def stn_t(image, theta, size):
    grid = F.affine_grid(theta, torch.Size(size), align_corners=True)
    return F.grid_sample(image, grid, align_corners=True,
                         padding_mode="zeros")


class AttnGNetTorch(tnn.Module):
    """Replica of G_NET with TREE.BRANCH_NUM=2, deterministic CA."""

    def __init__(self):
        super().__init__()
        ngf, ncf, nef = CFG.gf_dim, CFG.condition_dim, CFG.embedding_dim
        ngf16 = ngf * 16
        self.ca_net = tnn.Module()
        self.ca_net.fc = tnn.Linear(nef, ncf * 4, bias=True)

        h1 = tnn.Module()
        h1.label = tnn.Sequential(tnn.Linear(ncf + 81, ncf, bias=False),
                                  tnn.BatchNorm1d(ncf), tnn.ReLU(True))
        h1.bbox_net = tnn.Module()
        h1.bbox_net.encode = tnn.Sequential(
            conv3x3_t(ncf, ncf // 2, 2), tnn.LeakyReLU(0.2, True),
            conv3x3_t(ncf // 2, ncf // 4, 2), tnn.BatchNorm2d(ncf // 4),
            tnn.LeakyReLU(0.2, True),
            conv3x3_t(ncf // 4, ncf // 8, 2), tnn.BatchNorm2d(ncf // 8),
            tnn.LeakyReLU(0.2, True))
        layout_code = (ncf // 8) * 4
        h1.fc = tnn.Sequential(
            tnn.Linear(CFG.z_dim + ncf + layout_code, ngf16 * 4 * 4 * 2,
                       bias=False),
            tnn.BatchNorm1d(ngf16 * 4 * 4 * 2), GLU_T())
        h1.local1 = up_block_glu(ncf, ngf16 // 2)
        h1.local2 = up_block_glu(ngf16 // 2, ngf16 // 4)
        h1.upsample1 = up_block_glu(ngf16, ngf16 // 2)
        h1.upsample2 = up_block_glu(ngf16 // 2, ngf16 // 4)
        h1.upsample3 = up_block_glu(ngf16 // 2, ngf16 // 8)
        h1.upsample4 = up_block_glu(ngf16 // 8, ngf16 // 16)
        self.h_net1 = h1

        h2 = tnn.Module()
        h2.att = tnn.Module()
        h2.att.conv_context = tnn.Conv2d(nef, ngf, 1, 1, 0, bias=False)
        h2.residual = tnn.Sequential(ResBlockGLU_T(ngf * 2))
        h2.upsample = up_block_glu(ngf * 2, ngf)
        self.h_net2 = h2

        for k in (1, 2):
            img = tnn.Module()
            img.img = tnn.Sequential(conv3x3_t(ngf, 3), tnn.Tanh())
            setattr(self, f"img_net{k}", img)

    def forward(self, z, sent_emb, word_embs, mask, t_inv, onehot):
        b = z.shape[0]
        ngf, ncf = CFG.gf_dim, CFG.condition_dim
        ngf16 = ngf * 16
        x = self.ca_net.fc(sent_emb)
        a, gte = x[:, : ncf * 2], x[:, ncf * 2:]
        x = a * torch.sigmoid(gte)
        c_code = x[:, :ncf]          # deterministic: mu

        # INIT_STAGE_G
        local_labels = torch.zeros(b, NO, ncf)
        locals_sum = torch.zeros(b, ngf16 // 4, 16, 16)
        for i in range(NO):
            lab = self.h_net1.label(torch.cat([c_code, onehot[:, i]], 1))
            local_labels[:, i] = lab
            lab4 = lab.view(b, ncf, 1, 1).repeat(1, 1, 4, 4)
            h = self.h_net1.local2(self.h_net1.local1(lab4))
            locals_sum = locals_sum + stn_t(h, t_inv[:, i], h.shape)
        layout = torch.zeros(b, ncf, 16, 16)
        for i in range(NO):
            lab16 = local_labels[:, i].view(b, ncf, 1, 1).repeat(1, 1, 16, 16)
            layout = layout + stn_t(lab16, t_inv[:, i], lab16.shape)
        bbox_code = self.h_net1.bbox_net.encode(layout).view(b, -1)
        h = self.h_net1.fc(torch.cat([c_code, z, bbox_code], 1))
        h = h.view(b, ngf16, 4, 4)
        h = self.h_net1.upsample2(self.h_net1.upsample1(h))
        h = torch.cat([h, locals_sum], 1)
        h = self.h_net1.upsample4(self.h_net1.upsample3(h))   # (b, gf, 64, 64)
        img1 = self.img_net1.img(h)

        # NEXT_STAGE_G (GlobalAttention.py:72-123)
        ih = iw = h.shape[2]
        ql = ih * iw
        target = h.view(b, -1, ql).transpose(1, 2)             # (b, ql, idf)
        source = self.h_net2.att.conv_context(
            word_embs.unsqueeze(3)).squeeze(3)                 # (b, idf, T)
        attn = torch.bmm(target, source).view(b * ql, T)
        attn.data.masked_fill_(mask.repeat(ql, 1), -float("inf"))
        attn = torch.softmax(attn, 1).view(b, ql, T).transpose(1, 2)
        weighted = torch.bmm(source, attn).view(b, -1, ih, iw)
        h2 = torch.cat([h, weighted], 1)
        h2 = self.h_net2.residual(h2)
        h2 = self.h_net2.upsample(h2)
        img2 = self.img_net2.img(h2)
        return img1, img2


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
    return module


def test_attngan_gnet_forward_parity():
    tg = _randomize(AttnGNetTorch(), seed=9)
    tg.eval()
    rng = np.random.RandomState(1)
    b = 1
    z = rng.randn(b, CFG.z_dim).astype(np.float32)
    sent = rng.randn(b, CFG.embedding_dim).astype(np.float32)
    words = rng.randn(b, CFG.embedding_dim, T).astype(np.float32)
    caps = np.array([[3, 5, 2, 0, 0]], np.int32)   # len 3, 2 pad
    mask = caps == 0
    bbox = np.stack([rng.uniform(0.1, 0.5, (b, NO)),
                     rng.uniform(0.1, 0.5, (b, NO)),
                     rng.uniform(0.2, 0.4, (b, NO)),
                     rng.uniform(0.2, 0.4, (b, NO))], -1).astype(np.float32)
    onehot = np.zeros((b, NO, 81), np.float32)
    for j in range(NO):
        onehot[0, j, rng.randint(81)] = 1.0
    t_inv = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))

    with torch.no_grad():
        w1, w2 = tg(torch.from_numpy(z), torch.from_numpy(sent),
                    torch.from_numpy(words), torch.from_numpy(mask),
                    torch.from_numpy(t_inv), torch.from_numpy(onehot))
    want1, want2 = w1.numpy(), w2.numpy()

    sd = {k: v.numpy() for k, v in tg.state_dict().items()}
    params, stats = import_attngan_g({"netG": sd},
                                     branch_num=CFG.branch_num,
                                     r_num=CFG.r_num)
    g = GNet(CFG)
    variables = jax.jit(lambda r: g.init(
        r, jnp.asarray(z), jnp.asarray(sent),
        jnp.asarray(words.transpose(0, 2, 1)), jnp.asarray(mask),
        jnp.asarray(bbox), jnp.asarray(onehot), train=False,
        ca_rng=None))(jax.random.PRNGKey(0))
    assert (jax.tree.structure({"p": variables["params"],
                                "s": variables["batch_stats"]})
            == jax.tree.structure({"p": params, "s": stats}))
    out = g.apply({"params": params, "batch_stats": stats},
                  jnp.asarray(z), jnp.asarray(sent),
                  jnp.asarray(words.transpose(0, 2, 1)), jnp.asarray(mask),
                  jnp.asarray(bbox), jnp.asarray(onehot), train=False,
                  ca_rng=None)
    got1 = np.asarray(out["imgs"][0]).transpose(0, 3, 1, 2)
    got2 = np.asarray(out["imgs"][1]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got1, want1, atol=3e-4)
    np.testing.assert_allclose(got2, want2, atol=3e-4)
