"""AttnGAN models, encoders, DAMSM losses, and train step (tiny dims)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiple_objects_gan_tpu.losses.damsm import sent_loss, words_loss
from multiple_objects_gan_tpu.models.attngan import (
    COCO_ATTN,
    DNet64,
    DNetScale,
    GNet,
)
from multiple_objects_gan_tpu.nn.encoders import RNNEncoder
from multiple_objects_gan_tpu.train.attngan_step import (
    bce_probs,
    create_attngan_state,
    make_attngan_train_step,
)

CFG = dataclasses.replace(COCO_ATTN, gf_dim=8, df_dim=8, condition_dim=16,
                          embedding_dim=16, branch_num=2, r_num=1)
T = 6  # words


class TinyImageEncoder:
    """Stand-in for CNNEncoder in the train-step test (Inception on CPU is
    too slow for unit tests); same output contract."""

    def apply(self, variables, x, train=False):
        b = x.shape[0]
        pooled = jax.image.resize(x, (b, 17, 17, x.shape[-1]), "linear")
        w = variables["params"]["w"]
        region = jnp.einsum("bhwc,cd->bhwd", pooled, w)
        code = region.mean(axis=(1, 2))
        return region, code

    def init(self, rng):
        return {"params": {
            "w": jax.random.normal(rng, (3, CFG.embedding_dim)) * 0.1}}


def _text_batch(b=2, seed=0):
    rng = np.random.RandomState(seed)
    caps = np.zeros((b, T), np.int32)
    lens = rng.randint(2, T + 1, b).astype(np.int32)
    for i in range(b):
        caps[i, : lens[i]] = rng.randint(1, 20, lens[i])
    return jnp.asarray(caps), jnp.asarray(lens)


def test_rnn_encoder_shapes_and_masking():
    enc = RNNEncoder(ntoken=20, ninput=8, nhidden=16)
    caps, lens = _text_batch()
    variables = enc.init(jax.random.PRNGKey(0), caps, lens, train=False)
    words, sent = enc.apply(variables, caps, lens, train=False)
    assert words.shape == (2, T, 16)
    assert sent.shape == (2, 16)
    # padded positions are zero
    for i in range(2):
        assert np.allclose(np.asarray(words[i, int(lens[i]):]), 0.0)
    # sent_emb must not depend on padding content
    caps2 = caps.at[0, int(lens[0]):].set(7)
    _, sent2 = enc.apply(variables, caps2, lens, train=False)
    np.testing.assert_allclose(np.asarray(sent), np.asarray(sent2),
                               atol=1e-6)


def test_rnn_encoder_matches_torch_lstm():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    b, t, d, h = 2, 5, 4, 3
    rng = np.random.RandomState(0)
    x = rng.randn(b, t, d).astype(np.float32)
    lstm = tnn.LSTM(d, h, 1, batch_first=True, bidirectional=False)
    sd = {k: v.detach().numpy() for k, v in lstm.state_dict().items()}
    with torch.no_grad():
        want, (hn, cn) = lstm(torch.from_numpy(x))

    from multiple_objects_gan_tpu.nn.encoders import TorchLSTM
    cell = TorchLSTM(h)
    variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {"w_ih": sd["weight_ih_l0"], "w_hh": sd["weight_hh_l0"],
              "b_ih": sd["bias_ih_l0"], "b_hh": sd["bias_hh_l0"]}
    got, (hf, cf) = cell.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), hn[0].numpy(), atol=1e-5)


def test_gnet_forward_shapes():
    g = GNet(CFG)
    b = 2
    caps, lens = _text_batch(b)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((b, CFG.z_dim))
    sent = jnp.zeros((b, CFG.embedding_dim))
    words = jnp.zeros((b, T, CFG.embedding_dim))
    mask = caps == 0
    bbox = jnp.tile(jnp.array([0.2, 0.2, 0.4, 0.4]), (b, 3, 1))
    labels = jnp.zeros((b, 3, 81)).at[:, :, 1].set(1.0)
    variables = g.init(rng, z, sent, words, mask, bbox, labels, train=True,
                       ca_rng=rng)
    out, _ = g.apply(variables, z, sent, words, mask, bbox, labels,
                     train=True, ca_rng=rng, mutable=["batch_stats"])
    assert len(out["imgs"]) == CFG.branch_num
    assert out["imgs"][0].shape == (b, 64, 64, 3)
    assert out["imgs"][1].shape == (b, 128, 128, 3)
    assert len(out["att_maps"]) == CFG.branch_num - 1


def test_d_nets_shapes():
    b = 2
    rng = jax.random.PRNGKey(0)
    bbox = jnp.tile(jnp.array([0.2, 0.2, 0.4, 0.4]), (b, 3, 1))
    labels = jnp.zeros((b, 3, 81)).at[:, :, 1].set(1.0)
    d64 = DNet64(CFG)
    v = d64.init(rng, jnp.zeros((b, 64, 64, 3)), labels, bbox, train=True)
    feat, _ = d64.apply(v, jnp.zeros((b, 64, 64, 3)), labels, bbox,
                        train=True, mutable=["batch_stats"])
    assert feat.shape == (b, 4, 4, CFG.df_dim * 8)
    d128 = DNetScale(CFG, scale=128)
    v = d128.init(rng, jnp.zeros((b, 128, 128, 3)), train=True)
    feat, _ = d128.apply(v, jnp.zeros((b, 128, 128, 3)), train=True,
                         mutable=["batch_stats"])
    assert feat.shape == (b, 4, 4, CFG.df_dim * 8)


def test_damsm_losses_finite_and_sensitive():
    rng = np.random.RandomState(0)
    b, nef = 4, 16
    region = jnp.asarray(rng.randn(b, 17, 17, nef).astype(np.float32))
    words = jnp.asarray(rng.randn(b, T, nef).astype(np.float32))
    lens = jnp.asarray(np.array([3, 6, 4, 2], np.int32))
    cls = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    w0, w1, att = words_loss(region, words, lens, cls)
    assert np.isfinite(float(w0)) and np.isfinite(float(w1))
    assert att.shape == (b, 17, 17, T)
    cnn = jnp.asarray(rng.randn(b, nef).astype(np.float32))
    sent = jnp.asarray(rng.randn(b, nef).astype(np.float32))
    s0, s1 = sent_loss(cnn, sent, cls)
    assert np.isfinite(float(s0)) and np.isfinite(float(s1))
    # matched pairs should reduce the loss
    s0m, _ = sent_loss(cnn, cnn, cls)
    assert float(s0m) < float(s0)


def test_bce_probs_matches_definition():
    p = jnp.asarray([0.9, 0.1])
    want = -np.mean(np.log([0.9, 0.1]))
    np.testing.assert_allclose(float(bce_probs(p, 1.0)), want, rtol=1e-5)


def test_bce_probs_grad_matches_torch_incl_saturated():
    # torch BCELoss backward clamps the (p - y)/(p(1-p)) denominator to
    # 1e-12; the naive 1/p grad overflows f32 for subnormal p (a
    # saturated D sigmoid) and NaNs the step. Parity incl. p=0 / p=1.
    import torch

    vals = np.asarray([0.9, 0.1, 1e-30, 0.0, 1.0, 1.0 - 1e-7], np.float32)
    for target in (0.0, 1.0):
        tp = torch.tensor(vals, requires_grad=True)
        torch.nn.functional.binary_cross_entropy(
            tp, torch.full((len(vals),), target)).backward()
        got = jax.grad(lambda x: bce_probs(x, target))(jnp.asarray(vals))
        np.testing.assert_allclose(np.asarray(got), tp.grad.numpy(),
                                   rtol=1e-5)
        assert np.isfinite(np.asarray(got)).all()


def test_attngan_train_step():
    g = GNet(CFG)
    d_modules = {"d64": DNet64(CFG), "d128": DNetScale(CFG, scale=128)}
    text_enc = RNNEncoder(ntoken=20, ninput=8, nhidden=CFG.embedding_dim)
    image_enc = TinyImageEncoder()
    rng = jax.random.PRNGKey(0)
    caps, lens = _text_batch(4)
    enc_vars = {"text": text_enc.init(rng, caps, lens, train=False),
                "image": image_enc.init(rng)}
    state = create_attngan_state(CFG, g, d_modules, rng, batch_size=2,
                                 seq_len=T)
    step = jax.jit(make_attngan_train_step(CFG, g, d_modules, text_enc,
                                           image_enc))
    rng2 = np.random.RandomState(1)
    bbox = np.tile(np.array([0.2, 0.2, 0.4, 0.4], np.float32), (4, 3, 1))
    labels = np.zeros((4, 3, 81), np.float32)
    labels[:, :, 2] = 1.0
    batch = {
        "image64": jnp.asarray(rng2.randn(4, 64, 64, 3).astype(np.float32)),
        "image128": jnp.asarray(rng2.randn(4, 128, 128, 3).astype(np.float32)),
        "captions": caps, "cap_lens": lens,
        "class_ids": jnp.arange(4, dtype=jnp.int32),
        "bbox": jnp.asarray(bbox), "label_onehot": jnp.asarray(labels),
    }
    ema_before = jax.tree.leaves(state.g_ema)[0]
    state, metrics = step(state, enc_vars, batch, jax.random.PRNGKey(5),
                          jnp.float32(2e-4), jnp.float32(2e-4))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert {"d_loss_d64", "d_loss_d128", "w_loss", "s_loss",
            "kl_loss"} <= set(metrics)
    # EMA moved slightly toward the updated params
    ema_after = jax.tree.leaves(state.g_ema)[0]
    assert not np.allclose(np.asarray(ema_before), np.asarray(ema_after))


def test_attngan_train_step_branch3():
    """The PRODUCTION configuration (cfg/coco_attn_train.yml BRANCH_NUM=3,
    ref code/coco/attngan/cfg/coco_train.yml): D64+D128+D256 and both
    NEXT_STAGE_Gs composed into one train step (trainer.py:303-318).
    Tiny widths; asserts d256 losses and a 256px top scale."""
    cfg3 = dataclasses.replace(CFG, branch_num=3)
    g = GNet(cfg3)
    d_modules = {"d64": DNet64(cfg3), "d128": DNetScale(cfg3, scale=128),
                 "d256": DNetScale(cfg3, scale=256)}
    text_enc = RNNEncoder(ntoken=20, ninput=8, nhidden=cfg3.embedding_dim)
    image_enc = TinyImageEncoder()
    rng = jax.random.PRNGKey(0)
    caps, lens = _text_batch(4)
    enc_vars = {"text": text_enc.init(rng, caps, lens, train=False),
                "image": image_enc.init(rng)}
    state = create_attngan_state(cfg3, g, d_modules, rng, batch_size=2,
                                 seq_len=T)
    assert "d256" in state.d_params
    step = jax.jit(make_attngan_train_step(cfg3, g, d_modules, text_enc,
                                           image_enc))
    rng2 = np.random.RandomState(1)
    bbox = np.tile(np.array([0.2, 0.2, 0.4, 0.4], np.float32), (4, 3, 1))
    labels = np.zeros((4, 3, 81), np.float32)
    labels[:, :, 2] = 1.0
    batch = {
        "image64": jnp.asarray(rng2.randn(4, 64, 64, 3).astype(np.float32)),
        "image128": jnp.asarray(
            rng2.randn(4, 128, 128, 3).astype(np.float32)),
        "image256": jnp.asarray(
            rng2.randn(4, 256, 256, 3).astype(np.float32)),
        "captions": caps, "cap_lens": lens,
        "class_ids": jnp.arange(4, dtype=jnp.int32),
        "bbox": jnp.asarray(bbox), "label_onehot": jnp.asarray(labels),
    }
    d256_before = np.asarray(jax.tree.leaves(state.d_params["d256"])[0])
    state, metrics = step(state, enc_vars, batch, jax.random.PRNGKey(5),
                          jnp.float32(2e-4), jnp.float32(2e-4))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert {"d_loss_d64", "d_loss_d128", "d_loss_d256", "w_loss",
            "s_loss", "kl_loss"} <= set(metrics)
    # d256 params actually moved (the third branch is in the update path)
    d256_after = np.asarray(jax.tree.leaves(state.d_params["d256"])[0])
    assert not np.allclose(d256_before, d256_after)


def test_gnet_b_dcgan_single_head():
    """G_DCGAN ablation (model.py:531-571; upstream call is broken — we
    wire the single-image-head path correctly via GAN.B_DCGAN)."""
    import dataclasses
    dcfg = dataclasses.replace(CFG, b_dcgan=True)
    g = GNet(dcfg)
    b = 2
    caps, lens = _text_batch(b)
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((b, dcfg.z_dim))
    sent = jnp.zeros((b, dcfg.embedding_dim))
    words = jnp.zeros((b, T, dcfg.embedding_dim))
    bbox = jnp.tile(jnp.array([0.2, 0.2, 0.4, 0.4]), (b, 3, 1))
    labels = jnp.zeros((b, 3, 81)).at[:, :, 1].set(1.0)
    variables = g.init(rng, z, sent, words, caps == 0, bbox, labels,
                       train=False, ca_rng=None)
    out = g.apply(variables, z, sent, words, caps == 0, bbox, labels,
                  train=False, ca_rng=None)
    # single image head: only the FINAL scale is returned
    assert len(out["imgs"]) == 1
    top = 64 * 2 ** (dcfg.branch_num - 1)
    assert out["imgs"][0].shape == (b, top, top, 3)
