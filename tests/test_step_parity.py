"""ONE-STEP UPDATE parity vs a torch replica of the reference trainer.

Forward value parity (test_torch_parity.py) proves the models compute the
same function; this file proves one full TRAINING step produces the same
parameter updates — i.e. the loss orchestration (wrong-pair
``feat[:b-1]`` vs ``cond[1:]`` slicing, fakes detached in the D update,
G updated THROUGH the updated D, Adam(beta1=0.5)) matches the reference
hot loop (code/multi-mnist/trainer.py:125-157, miscc/utils.py:71-123)
exactly, not just the forwards (VERDICT r4 weak #3).

Method: random-init the torch replicas, import their weights into the
Flax models (the same importer path the forward-parity tests pin), run
ONE jitted train step (train/step.py) and ONE hand-written torch replica
step from identical weights, batch, and noise (the jax step's internal
z is reproduced outside by replaying its fold_in/split sequence), then
compare:

  * every loss scalar (errD + components, errG) — tight;
  * post-step BatchNorm running stats (linear in the data; validates the
    reference BN call order incl. the b-1 wrong-pair head call) — tight;
  * post-step parameter deltas — Adam normalizes each element by
    sqrt(second moment), so a first step is ~ lr * sign(grad): elements
    whose true gradient is ~0 legitimately flip sign under f32 noise.
    The assertion is therefore: per-tensor cosine similarity of the
    deltas, the mean |delta difference| in lr units, and a bounded
    fraction of sign-flipped elements. Orchestration drift (a swapped
    slice, a mis-weighted term) changes a large fraction of elements and
    fails all three; fp noise cannot.

Variants: mnist (label-sum cond, no CA) and coco-stackgan-1 (CA mu cond,
KL * 2, per-object BN on the shared label/local blocks).
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multiple_objects_gan_tpu.io.torch_import import (  # noqa: E402
    import_stage1_d,
    import_stage1_g,
)
from multiple_objects_gan_tpu.models import common  # noqa: E402
from multiple_objects_gan_tpu.models.stage1 import (  # noqa: E402
    Stage1D,
    Stage1G,
)
from multiple_objects_gan_tpu.ops import (  # noqa: E402
    transformation_matrix,
    transformation_matrix_inverse,
)
from multiple_objects_gan_tpu.train.step import (  # noqa: E402
    create_state,
    make_train_step,
)
from test_torch_parity import (  # noqa: E402
    MCFG as G8CFG,
    S1CFG,
    Stage1DTorch,
    Stage1GTorch,
    StackganD_Torch,
    StackganG_Torch,
    _randomize,
    stn_t,
)

LR = 2e-4
B = 4


def _bce(logits, target_val):
    return F.binary_cross_entropy_with_logits(
        logits, torch.full_like(logits, target_val))


def _torch_adam(module):
    return torch.optim.Adam(module.parameters(), lr=LR,
                            betas=(0.5, 0.999), eps=1e-8)


def _replay_step_noise(rng, step, b, z_dim):
    """Reproduce the z (and ca rng) the jitted step derives internally
    (train/step.py make_train_step: fold_in(rng, step) -> split)."""
    r = jax.random.fold_in(rng, step)
    rng_z, rng_ca = jax.random.split(r)
    z = np.asarray(jax.random.normal(rng_z, (b, z_dim), jnp.float32))
    return z, rng_ca


def _layout_batch(b, n_obj, label_dim, seed):
    rng = np.random.RandomState(seed)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, n_obj)),
                     rng.uniform(0.05, 0.5, (b, n_obj)),
                     rng.uniform(0.2, 0.4, (b, n_obj)),
                     rng.uniform(0.2, 0.4, (b, n_obj))], -1).astype(
                         np.float32)
    onehot = np.zeros((b, n_obj, label_dim), np.float32)
    for i in range(b):
        for j in range(n_obj):
            onehot[i, j, rng.randint(label_dim)] = 1.0
    return bbox, onehot, rng


def _compare_losses(got: dict, want: dict, atol=1e-3):
    for k, v in want.items():
        np.testing.assert_allclose(float(got[k]), v, atol=atol,
                                   err_msg=f"loss {k}")


def _compare_deltas(pre, post_t, post_j, what, lr=LR,
                    min_cosine=0.999, max_mean_lr=0.02,
                    max_flip_frac=0.005):
    """Per-tensor delta comparison robust to Adam sign-descent noise."""
    flat_pre = {"/".join(p): np.asarray(v, np.float32)
                for p, v in _flatten(pre)}
    flat_t = {"/".join(p): np.asarray(v, np.float32)
              for p, v in _flatten(post_t)}
    flat_j = {"/".join(p): np.asarray(v, np.float32)
              for p, v in _flatten(post_j)}
    assert flat_t.keys() == flat_j.keys() == flat_pre.keys()
    for k in flat_pre:
        dt = (flat_t[k] - flat_pre[k]).ravel()
        dj = (flat_j[k] - flat_pre[k]).ravel()
        assert dt.size == dj.size
        norm = float(np.linalg.norm(dt) * np.linalg.norm(dj))
        if norm == 0.0:
            np.testing.assert_allclose(dj, dt, atol=1e-7,
                                       err_msg=f"{what}:{k}")
            continue
        cos = float(np.dot(dt, dj) / norm)
        diff = np.abs(dt - dj) / lr
        mean_lr = float(diff.mean())
        flip = float((diff > 0.5).mean())
        assert cos > min_cosine, f"{what}:{k} delta cosine {cos}"
        assert mean_lr < max_mean_lr, (
            f"{what}:{k} mean |delta diff| = {mean_lr:.4f} lr")
        assert flip <= max_flip_frac, (
            f"{what}:{k} {flip:.4%} elements flipped by > 0.5 lr")


def _flatten(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(tuple(str(getattr(k, "key", k)) for k in path), leaf)
            for path, leaf in flat]


def _compare_stats(got, want, what, atol=5e-4):
    flat_g = dict(_flatten(got))
    flat_w = dict(_flatten(want))
    assert flat_g.keys() == flat_w.keys()
    for k in flat_g:
        np.testing.assert_allclose(
            np.asarray(flat_g[k], np.float32),
            np.asarray(flat_w[k], np.float32),
            atol=atol, err_msg=f"{what}:{'/'.join(k)}")


# ---------------------------------------------------------------------------
# mnist
# ---------------------------------------------------------------------------

MNIST_CFG = dataclasses.replace(common.MNIST, gf_dim=G8CFG.gf_dim, df_dim=8)


def _import_mnist(tg, td):
    sd_g = {k: v.detach().numpy().copy() for k, v in tg.state_dict().items()}
    g_params, g_stats = import_stage1_g({"netG": sd_g}, MNIST_CFG)
    sd_d = {k.replace("head.", "get_cond_logits.outlogits."):
            v.detach().numpy().copy() for k, v in td.state_dict().items()}
    d_params, d_stats = import_stage1_d(sd_d, MNIST_CFG)
    return g_params, g_stats, d_params, d_stats


def _mnist_d_feat(td, image, label, t_fwd, t_inv):
    b = image.shape[0]
    ndf = 8
    locals_sum = torch.zeros(b, ndf * 2, 16, 16)
    for idx in range(3):
        lab = label[:, idx].view(b, 10, 1, 1).repeat(1, 1, 16, 16)
        patch = stn_t(image, t_fwd[:, idx], (b, image.shape[1], 16, 16))
        h = td.local(torch.cat([patch, lab], 1))
        locals_sum = locals_sum + stn_t(h, t_inv[:, idx],
                                        (b, h.shape[1], 16, 16))
    h = td.act(td.conv1(image))
    h = td.act(td.bn2(td.conv2(h)))
    h = torch.cat([h, locals_sum], 1)
    h = td.act(td.bn3(td.conv3(h)))
    return td.act(td.bn4(td.conv4(h)))


def _mnist_d_head(td, h, cond):
    c = cond.view(cond.shape[0], 10, 1, 1).repeat(1, 1, 4, 4)
    return td.head(torch.cat([h, c], 1)).view(-1)


def _torch_step_mnist(tg, td, image_t, bbox, onehot, z):
    """The reference mnist step (trainer.py:125-157): D update over
    real/wrong/fake with the fake detached, then G through the updated D."""
    tg.train()
    td.train()
    opt_g, opt_d = _torch_adam(tg), _torch_adam(td)
    t_fwd = torch.from_numpy(
        np.asarray(transformation_matrix(jnp.asarray(bbox))))
    t_inv = torch.from_numpy(
        np.asarray(transformation_matrix_inverse(jnp.asarray(bbox))))
    lab_t = torch.from_numpy(onehot)
    cond = lab_t.sum(1)

    fake = tg(torch.from_numpy(z), t_inv, lab_t)

    feat_real = _mnist_d_feat(td, image_t, lab_t, t_fwd, t_inv)
    feat_fake = _mnist_d_feat(td, fake.detach(), lab_t, t_fwd, t_inv)
    real_logits = _mnist_d_head(td, feat_real, cond)
    wrong_logits = _mnist_d_head(td, feat_real[:-1], cond[1:])
    fake_logits = _mnist_d_head(td, feat_fake, cond)
    err_real = _bce(real_logits, 1.0)
    err_wrong = _bce(wrong_logits, 0.0)
    err_fake = _bce(fake_logits, 0.0)
    err_d = err_real + 0.5 * (err_fake + err_wrong)
    opt_d.zero_grad()
    err_d.backward()
    opt_d.step()

    feat_fake2 = _mnist_d_feat(td, fake, lab_t, t_fwd, t_inv)
    g_logits = _mnist_d_head(td, feat_fake2, cond)
    err_g = _bce(g_logits, 1.0)
    opt_g.zero_grad()
    err_g.backward()
    opt_g.step()
    return {"d_loss": float(err_d), "d_loss_real": float(err_real),
            "d_loss_wrong": float(err_wrong), "d_loss_fake": float(err_fake),
            "g_loss": float(err_g)}


def test_mnist_one_step_update_parity():
    tg = _randomize(Stage1GTorch(), seed=3)
    td = _randomize(Stage1DTorch(), seed=11)
    g_params, g_stats, d_params, d_stats = _import_mnist(tg, td)

    g, d = Stage1G(MNIST_CFG), Stage1D(MNIST_CFG)
    state = create_state(MNIST_CFG, g, d, jax.random.PRNGKey(0),
                         batch_size=2)
    state = state.replace(g_params=g_params, d_params=d_params,
                          g_stats=g_stats, d_stats=d_stats)

    bbox, onehot, rs = _layout_batch(B, 3, 10, seed=7)
    image_u8 = rs.randint(0, 256, (B, 64, 64, 1)).astype(np.uint8)
    batch = {"image": jnp.asarray(image_u8), "bbox": jnp.asarray(bbox),
             "label_onehot": jnp.asarray(onehot)}
    rng = jax.random.PRNGKey(42)

    step = jax.jit(make_train_step(MNIST_CFG, g, d))
    new_state, metrics = step(state, batch, rng,
                              jnp.float32(LR), jnp.float32(LR))

    z, _ = _replay_step_noise(rng, 0, B, MNIST_CFG.z_dim)
    image_t = torch.from_numpy(
        (image_u8.astype(np.float32) / 127.5 - 1.0).transpose(0, 3, 1, 2))
    want = _torch_step_mnist(tg, td, image_t, bbox, onehot, z)

    _compare_losses(metrics, want)

    post_g_params, post_g_stats, post_d_params, post_d_stats = \
        _import_mnist(tg, td)
    _compare_stats(new_state.g_stats, post_g_stats, "g_stats")
    _compare_stats(new_state.d_stats, post_d_stats, "d_stats")
    _compare_deltas(g_params, post_g_params, new_state.g_params, "G")
    _compare_deltas(d_params, post_d_params, new_state.d_params, "D")


# ---------------------------------------------------------------------------
# coco-stackgan-1 (adds the CA reparametrization + KL * 2 path, mu-fed D
# head with the condition detached in BOTH losses, per-object BN on the
# shared label embed)
# ---------------------------------------------------------------------------

S1STEP_CFG = dataclasses.replace(S1CFG, df_dim=8)
KL_COEFF = 2.0  # cfg/coco_s1_train.yml TRAIN.COEFF.KL (ref coco_train.yml)


def _import_stackgan(tg, td):
    sd_g = {k.replace("ca_fc", "ca_net.fc"): v.detach().numpy().copy()
            for k, v in tg.state_dict().items()}
    g_params, g_stats = import_stage1_g({"netG": sd_g}, S1STEP_CFG)
    sd_d = {k.replace("head.", "get_cond_logits.outlogits."):
            v.detach().numpy().copy() for k, v in td.state_dict().items()}
    d_params, d_stats = import_stage1_d(sd_d, S1STEP_CFG)
    return g_params, g_stats, d_params, d_stats


def _stackgan_g_train_fwd(tg, text, z, t_inv, onehot, eps):
    """StackganG_Torch.forward with the TRAIN-mode CA reparametrization
    (c = mu + eps * exp(0.5 * logvar), ref model.py:56-71) — eps injected
    so it can replay the jax step's ca_rng draw."""
    b = z.shape[0]
    ngf, ef = S1CFG.ngf, 16
    x = torch.relu(tg.ca_fc(text))
    mu, logvar = x[:, :ef], x[:, ef:]
    c = mu + eps * torch.exp(0.5 * logvar)
    locals_sum = torch.zeros(b, ngf // 4, 16, 16)
    local_labels = []
    for idx in range(3):
        lab = tg.label(torch.cat([c, onehot[:, idx]], 1))
        local_labels.append(lab)
        lab4 = lab.view(b, ef, 1, 1).repeat(1, 1, 4, 4)
        h = tg.local2(tg.local1(lab4))
        locals_sum = locals_sum + stn_t(h, t_inv[:, idx], h.shape)
    layout = torch.zeros(b, ef, 16, 16)
    for idx in range(3):
        lab16 = local_labels[idx].view(b, ef, 1, 1).repeat(1, 1, 16, 16)
        layout = layout + stn_t(lab16, t_inv[:, idx], lab16.shape)
    bbox_code = tg.bbox_net.encode(layout).view(b, -1)
    h = tg.fc(torch.cat([z, c, bbox_code], 1)).view(b, ngf, 4, 4)
    h = tg.upsample2(tg.upsample1(h))
    h = torch.cat([h, locals_sum], 1)
    h = tg.upsample4(tg.upsample3(h))
    return tg.img(h), mu, logvar


def _stackgan_d_feat(td, image, label, t_fwd, t_inv):
    b = image.shape[0]
    ndf = 8
    locals_sum = torch.zeros(b, ndf * 2, 16, 16)
    for idx in range(3):
        lab = label[:, idx].view(b, 81, 1, 1).repeat(1, 1, 16, 16)
        patch = stn_t(image, t_fwd[:, idx], (b, image.shape[1], 16, 16))
        h = td.local(torch.cat([patch, lab], 1))
        locals_sum = locals_sum + stn_t(h, t_inv[:, idx],
                                        (b, h.shape[1], 16, 16))
    h = td.act(td.conv1(image))
    h = td.act(td.bn2(td.conv2(h)))
    h = torch.cat([h, locals_sum], 1)
    h = td.act(td.bn3(td.conv3(h)))
    return td.act(td.bn4(td.conv4(h)))


def _stackgan_d_head(td, h, cond):
    c = cond.view(cond.shape[0], S1CFG.condition_dim, 1, 1).repeat(
        1, 1, 4, 4)
    return td.head(torch.cat([h, c], 1)).view(-1)


def _torch_step_stackgan(tg, td, image_t, bbox, onehot, text, z, eps):
    """The reference stackgan-1 step (code/coco/stackgan/trainer.py:155-235):
    cond = mu DETACHED in both losses, errG += KL * COEFF.KL."""
    tg.train()
    td.train()
    opt_g, opt_d = _torch_adam(tg), _torch_adam(td)
    t_fwd = torch.from_numpy(
        np.asarray(transformation_matrix(jnp.asarray(bbox))))
    t_inv = torch.from_numpy(
        np.asarray(transformation_matrix_inverse(jnp.asarray(bbox))))
    lab_t = torch.from_numpy(onehot)

    fake, mu, logvar = _stackgan_g_train_fwd(
        tg, torch.from_numpy(text), torch.from_numpy(z), t_inv, lab_t,
        torch.from_numpy(eps))
    cond = mu.detach()

    feat_real = _stackgan_d_feat(td, image_t, lab_t, t_fwd, t_inv)
    feat_fake = _stackgan_d_feat(td, fake.detach(), lab_t, t_fwd, t_inv)
    real_logits = _stackgan_d_head(td, feat_real, cond)
    wrong_logits = _stackgan_d_head(td, feat_real[:-1], cond[1:])
    fake_logits = _stackgan_d_head(td, feat_fake, cond)
    err_real = _bce(real_logits, 1.0)
    err_wrong = _bce(wrong_logits, 0.0)
    err_fake = _bce(fake_logits, 0.0)
    err_d = err_real + 0.5 * (err_fake + err_wrong)
    opt_d.zero_grad()
    err_d.backward()
    opt_d.step()

    feat_fake2 = _stackgan_d_feat(td, fake, lab_t, t_fwd, t_inv)
    g_logits = _stackgan_d_head(td, feat_fake2, cond)
    err_adv = _bce(g_logits, 1.0)
    kl = -0.5 * torch.mean(1.0 + logvar - mu.pow(2) - logvar.exp())
    err_g = err_adv + KL_COEFF * kl
    opt_g.zero_grad()
    err_g.backward()
    opt_g.step()
    return {"d_loss": float(err_d), "d_loss_real": float(err_real),
            "d_loss_wrong": float(err_wrong), "d_loss_fake": float(err_fake),
            "g_loss": float(err_adv), "kl_loss": float(kl),
            "g_loss_total": float(err_g)}


def test_stackgan_s1_one_step_update_parity():
    tg = _randomize(StackganG_Torch(), seed=21)
    td = _randomize(StackganD_Torch(), seed=51)
    g_params, g_stats, d_params, d_stats = _import_stackgan(tg, td)

    g, d = Stage1G(S1STEP_CFG), Stage1D(S1STEP_CFG)
    state = create_state(S1STEP_CFG, g, d, jax.random.PRNGKey(0),
                         batch_size=2)
    state = state.replace(g_params=g_params, d_params=d_params,
                          g_stats=g_stats, d_stats=d_stats)

    bbox, onehot, rs = _layout_batch(B, 3, 81, seed=13)
    image_u8 = rs.randint(0, 256, (B, 64, 64, 3)).astype(np.uint8)
    text = rs.randn(B, S1CFG.text_dim).astype(np.float32)
    batch = {"image": jnp.asarray(image_u8), "bbox": jnp.asarray(bbox),
             "label_onehot": jnp.asarray(onehot),
             "text_embedding": jnp.asarray(text)}
    rng = jax.random.PRNGKey(99)

    step = jax.jit(make_train_step(S1STEP_CFG, g, d, kl_coeff=KL_COEFF))
    new_state, metrics = step(state, batch, rng,
                              jnp.float32(LR), jnp.float32(LR))

    z, rng_ca = _replay_step_noise(rng, 0, B, S1STEP_CFG.z_dim)
    eps = np.asarray(jax.random.normal(
        rng_ca, (B, S1STEP_CFG.condition_dim), jnp.float32))
    image_t = torch.from_numpy(
        (image_u8.astype(np.float32) / 127.5 - 1.0).transpose(0, 3, 1, 2))
    want = _torch_step_stackgan(tg, td, image_t, bbox, onehot, text, z, eps)

    _compare_losses(metrics, want)

    post_g_params, post_g_stats, post_d_params, post_d_stats = \
        _import_stackgan(tg, td)
    _compare_stats(new_state.g_stats, post_g_stats, "g_stats")
    _compare_stats(new_state.d_stats, post_d_stats, "d_stats")
    _compare_deltas(g_params, post_g_params, new_state.g_params, "G")
    _compare_deltas(d_params, post_d_params, new_state.d_params, "D")
