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


# ---------------------------------------------------------------------------
# D_NET64 (object pathway + Sigmoid cond/uncond heads) value parity
# ---------------------------------------------------------------------------

DCFG = dataclasses.replace(COCO_ATTN, df_dim=8, embedding_dim=16)
NDF, NEF = DCFG.df_dim, DCFG.embedding_dim


class AttnD64Torch(tnn.Module):
    """Replica of code/coco/attngan/model.py:646-711 + D_GET_LOGITS
    :616-642 (Sigmoid outputs)."""

    def __init__(self):
        super().__init__()
        ndf, nef = NDF, NEF
        self.conv1 = tnn.Conv2d(3, ndf, 4, 2, 1, bias=False)
        self.conv2 = tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(ndf * 2)
        self.conv3 = tnn.Conv2d(ndf * 4, ndf * 4, 4, 2, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(ndf * 4)
        self.conv4 = tnn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False)
        self.bn4 = tnn.BatchNorm2d(ndf * 8)
        self.local = tnn.Sequential(
            tnn.Conv2d(3 + 81, ndf * 2, 4, 1, 1, bias=False),
            tnn.BatchNorm2d(ndf * 2), tnn.LeakyReLU(0.2, True))
        self.joint = tnn.Sequential(
            conv3x3_t(ndf * 8 + nef, ndf * 8), tnn.BatchNorm2d(ndf * 8),
            tnn.LeakyReLU(0.2, True))
        self.out_cond = tnn.Conv2d(ndf * 8, 1, kernel_size=4, stride=4)
        self.out_uncond = tnn.Conv2d(ndf * 8, 1, kernel_size=4, stride=4)
        self.act = tnn.LeakyReLU(0.2, True)

    def forward(self, image, label, t_fwd, t_inv, sent):
        b = image.shape[0]
        locals_sum = torch.zeros(b, NDF * 2, 16, 16)
        for idx in range(3):
            lab = label[:, idx].view(b, 81, 1, 1).repeat(1, 1, 16, 16)
            patch = stn_t(image, t_fwd[:, idx], (b, 3, 16, 16))
            h = self.local(torch.cat([patch, lab], 1))
            locals_sum = locals_sum + stn_t(h, t_inv[:, idx],
                                            (b, h.shape[1], 16, 16))
        h = self.act(self.conv1(image))
        h = self.act(self.bn2(self.conv2(h)))
        h = torch.cat([h, locals_sum], 1)
        h = self.act(self.bn3(self.conv3(h)))
        h = self.act(self.bn4(self.conv4(h)))
        c = sent.view(b, NEF, 1, 1).repeat(1, 1, 4, 4)
        cond = torch.sigmoid(self.out_cond(
            self.joint(torch.cat([h, c], 1)))).view(-1)
        uncond = torch.sigmoid(self.out_uncond(h)).view(-1)
        return cond, uncond


def _overlay_variables(module, init_args, params, stats):
    """Init to discover the full variable tree (heads the feature-forward
    tests don't map), then overlay the imported leaves."""
    import copy

    variables = module.init(jax.random.PRNGKey(0), *init_args, train=False)
    full_p = copy.deepcopy(dict(jax.tree.map(np.asarray,
                                             variables["params"])))
    full_s = copy.deepcopy(dict(jax.tree.map(np.asarray,
                                             variables["batch_stats"])))

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst[k], v)
            else:
                dst[k] = v

    overlay(full_p, params)
    overlay(full_s, stats)
    return {"params": full_p, "batch_stats": full_s}


def _bn_split(sd, prefix):
    return ({"scale": sd[f"{prefix}.weight"].numpy(),
             "bias": sd[f"{prefix}.bias"].numpy()},
            {"mean": sd[f"{prefix}.running_mean"].numpy(),
             "var": sd[f"{prefix}.running_var"].numpy()})


def _conv_k(sd, key):
    return np.transpose(sd[key].numpy(), (2, 3, 1, 0))


def test_attngan_d64_forward_parity():
    from multiple_objects_gan_tpu.models.attngan import DNet64
    from multiple_objects_gan_tpu.ops import transformation_matrix

    td = _randomize(AttnD64Torch(), seed=61)
    td.eval()
    rng = np.random.RandomState(7)
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
    sent = rng.randn(b, NEF).astype(np.float32)
    t_fwd = np.asarray(transformation_matrix(jnp.asarray(bbox)))
    t_inv = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        want_c, want_u = td(torch.from_numpy(img), torch.from_numpy(onehot),
                            torch.from_numpy(t_fwd),
                            torch.from_numpy(t_inv),
                            torch.from_numpy(sent))

    # rename the replica's flat attrs to the reference's state_dict keys
    # (D_NET64 holds its heads as COND_DNET/UNCOND_DNET submodules) and go
    # through the real importer
    from multiple_objects_gan_tpu.io.torch_import import import_attngan_d
    sd = {k.replace("joint.", "COND_DNET.jointConv.")
           .replace("out_cond.", "COND_DNET.outlogits.0.")
           .replace("out_uncond.", "UNCOND_DNET.outlogits.0."): v.numpy()
          for k, v in td.state_dict().items()}
    params, stats = import_attngan_d(sd, scale=64)

    d = DNet64(DCFG)
    variables = {"params": params, "batch_stats": stats}
    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    h = d.apply(variables, img_nhwc, jnp.asarray(onehot), jnp.asarray(bbox),
                train=False)
    got_c = d.apply(variables, h, jnp.asarray(sent), train=False,
                    method="cond_logits")
    got_u = d.apply(variables, h, train=False, method="uncond_logits")
    np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_u), want_u.numpy(), atol=3e-4)


# ---------------------------------------------------------------------------
# D_NET128 (encode_image_by_16times stack, no object pathway) value parity
# ---------------------------------------------------------------------------

class AttnD128Torch(tnn.Module):
    """Replica of code/coco/attngan/model.py:715-734 (+ shared blocks
    :575-613)."""

    def __init__(self):
        super().__init__()
        ndf = NDF
        self.img_code_s16 = tnn.Sequential(
            tnn.Conv2d(3, ndf, 4, 2, 1, bias=False), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 2), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 4), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 8), tnn.LeakyReLU(0.2, True))
        self.img_code_s32 = tnn.Sequential(
            tnn.Conv2d(ndf * 8, ndf * 16, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 16), tnn.LeakyReLU(0.2, True))
        self.img_code_s32_1 = tnn.Sequential(
            conv3x3_t(ndf * 16, ndf * 8), tnn.BatchNorm2d(ndf * 8),
            tnn.LeakyReLU(0.2, True))

    def forward(self, x):
        return self.img_code_s32_1(self.img_code_s32(self.img_code_s16(x)))


def test_attngan_d128_forward_parity():
    from multiple_objects_gan_tpu.models.attngan import DNetScale

    td = _randomize(AttnD128Torch(), seed=71)
    td.eval()
    rng = np.random.RandomState(9)
    img = rng.randn(2, 3, 128, 128).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        want = td(torch.from_numpy(img)).numpy()

    sd = td.state_dict()
    s16_p, s16_s = {}, {}
    for j, (ci, bi) in enumerate([(0, None), (2, 3), (5, 6), (8, 9)]):
        s16_p[f"Conv_{j}"] = {"kernel": _conv_k(sd, f"img_code_s16.{ci}.weight")}
        if bi is not None:
            p, s = _bn_split(sd, f"img_code_s16.{bi}")
            s16_p[f"TorchBatchNorm_{j-1}"] = p
            s16_s[f"TorchBatchNorm_{j-1}"] = s
    s32bn_p, s32bn_s = _bn_split(sd, "img_code_s32.1")
    s321bn_p, s321bn_s = _bn_split(sd, "img_code_s32_1.1")
    params = {
        "img_code_s16": s16_p,
        "img_code_s32": {"Conv_0": {"kernel": _conv_k(sd, "img_code_s32.0.weight")},
                         "TorchBatchNorm_0": s32bn_p},
        "img_code_s32_1": {
            "Conv3x3_0": {"Conv_0": {"kernel": _conv_k(sd, "img_code_s32_1.0.weight")}},
            "TorchBatchNorm_0": s321bn_p},
    }
    stats = {"img_code_s16": s16_s,
             "img_code_s32": {"TorchBatchNorm_0": s32bn_s},
             "img_code_s32_1": {"TorchBatchNorm_0": s321bn_s}}

    d = DNetScale(DCFG, scale=128, b_jcu=False)
    # b_jcu=False drops the uncond head; the cond head params are unused in
    # the feature forward, so init to discover the full tree then overlay
    variables = _overlay_variables(d, (jnp.zeros((1, 128, 128, 3)),),
                                   params, stats)
    got = d.apply(variables,
                  jnp.asarray(img.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=3e-4)


# ---------------------------------------------------------------------------
# D_NET256 (s16 + two downBlocks + two Block3x3_leakRelu) value parity
# ---------------------------------------------------------------------------

class AttnD256Torch(tnn.Module):
    """Replica of code/coco/attngan/model.py:738-760 (+ shared blocks
    :575-613)."""

    def __init__(self):
        super().__init__()
        ndf = NDF
        self.img_code_s16 = tnn.Sequential(
            tnn.Conv2d(3, ndf, 4, 2, 1, bias=False), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 2), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 4), tnn.LeakyReLU(0.2, True),
            tnn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 8), tnn.LeakyReLU(0.2, True))
        self.img_code_s32 = tnn.Sequential(
            tnn.Conv2d(ndf * 8, ndf * 16, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 16), tnn.LeakyReLU(0.2, True))
        self.img_code_s64 = tnn.Sequential(
            tnn.Conv2d(ndf * 16, ndf * 32, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ndf * 32), tnn.LeakyReLU(0.2, True))
        self.img_code_s64_1 = tnn.Sequential(
            conv3x3_t(ndf * 32, ndf * 16), tnn.BatchNorm2d(ndf * 16),
            tnn.LeakyReLU(0.2, True))
        self.img_code_s64_2 = tnn.Sequential(
            conv3x3_t(ndf * 16, ndf * 8), tnn.BatchNorm2d(ndf * 8),
            tnn.LeakyReLU(0.2, True))

    def forward(self, x):
        h = self.img_code_s32(self.img_code_s16(x))
        return self.img_code_s64_2(self.img_code_s64_1(self.img_code_s64(h)))


def test_attngan_d256_forward_parity():
    from multiple_objects_gan_tpu.models.attngan import DNetScale

    td = _randomize(AttnD256Torch(), seed=73)
    td.eval()
    rng = np.random.RandomState(11)
    img = rng.randn(2, 3, 256, 256).astype(np.float32).clip(-1, 1)
    with torch.no_grad():
        want = td(torch.from_numpy(img)).numpy()

    sd = td.state_dict()
    s16_p, s16_s = {}, {}
    for j, (ci, bi) in enumerate([(0, None), (2, 3), (5, 6), (8, 9)]):
        s16_p[f"Conv_{j}"] = {"kernel": _conv_k(sd, f"img_code_s16.{ci}.weight")}
        if bi is not None:
            p, s = _bn_split(sd, f"img_code_s16.{bi}")
            s16_p[f"TorchBatchNorm_{j-1}"] = p
            s16_s[f"TorchBatchNorm_{j-1}"] = s
    params = {"img_code_s16": s16_p}
    stats = {"img_code_s16": s16_s}
    for name in ("img_code_s32", "img_code_s64"):  # downBlocks
        p, s = _bn_split(sd, f"{name}.1")
        params[name] = {"Conv_0": {"kernel": _conv_k(sd, f"{name}.0.weight")},
                        "TorchBatchNorm_0": p}
        stats[name] = {"TorchBatchNorm_0": s}
    for name in ("img_code_s64_1", "img_code_s64_2"):  # Block3x3_leakRelu
        p, s = _bn_split(sd, f"{name}.1")
        params[name] = {
            "Conv3x3_0": {"Conv_0": {"kernel": _conv_k(sd, f"{name}.0.weight")}},
            "TorchBatchNorm_0": p}
        stats[name] = {"TorchBatchNorm_0": s}

    d = DNetScale(DCFG, scale=256, b_jcu=False)
    variables = _overlay_variables(d, (jnp.zeros((1, 256, 256, 3)),),
                                   params, stats)
    got = d.apply(variables,
                  jnp.asarray(img.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=3e-4)
