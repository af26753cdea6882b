"""DAMSM encoder pretraining (train/damsm_step, io/damsm_export,
cli/damsm_runner).

Beyond-reference surface: the reference README has users download the
pretrained DAMSM model (README.md:33-35); here it is trainable in-framework.
Step mechanics are tested with a tiny stand-in image encoder (same
emb_features / emb_cnn_code top-level layout as CNNEncoder) so the full
Inception compile is paid only by the export round-trip + CLI smoke tests.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multiple_objects_gan_tpu.nn.encoders import RNNEncoder
from multiple_objects_gan_tpu.train.damsm_step import (
    DAMSMTrainState, create_damsm_state, image_emb_subtree,
    make_damsm_eval_fn, make_damsm_train_step)


class TinyImageEnc(nn.Module):
    """CNNEncoder-shaped stand-in: frozen 'backbone' conv + the two
    trainable projection heads at the same top-level param names."""

    nef: int = 16

    @nn.compact
    def __call__(self, x, train=False):
        b = x.shape[0]
        h = nn.Conv(8, (3, 3), strides=(4, 4), name="backbone_conv")(x)
        feat = jax.image.resize(h, (b, 17, 17, 8), "bilinear")
        pooled = h.mean(axis=(1, 2))
        region = nn.Dense(self.nef, use_bias=False,
                          name="emb_features")(feat)
        code = nn.Dense(self.nef, name="emb_cnn_code")(pooled)
        return region, code


def _batch(b=4, t=6, size=32, seed=0):
    rng = np.random.RandomState(seed)
    lens = rng.randint(2, t + 1, b).astype(np.int32)
    caps = np.zeros((b, t), np.int32)
    for i, ln in enumerate(lens):
        caps[i, :ln] = rng.randint(1, 20, ln)
    return {
        "image32": rng.randint(0, 255, (b, size, size, 3), np.uint8),
        "captions": caps, "cap_lens": lens,
        "class_ids": np.arange(b, dtype=np.int32),
    }


def _setup(nef=16):
    text_enc = RNNEncoder(ntoken=20, ninput=8, nhidden=nef)
    image_enc = TinyImageEnc(nef=nef)
    state = create_damsm_state(text_enc, image_enc, jax.random.PRNGKey(0),
                               batch_size=2, seq_len=6, image_size=32)
    return text_enc, image_enc, state


def test_damsm_step_decreases_loss():
    text_enc, image_enc, state = _setup()
    step = jax.jit(make_damsm_train_step(text_enc, image_enc))
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(30):
        state, metrics = step(state, batch, rng, np.float32(2e-3))
        if first is None:
            first = float(metrics["damsm_loss"])
    last = float(metrics["damsm_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    assert float(metrics["rnn_grad_norm"]) >= 0.0
    assert int(state.step) == 30


def test_damsm_backbone_frozen_heads_train():
    text_enc, image_enc, state = _setup()
    step = jax.jit(make_damsm_train_step(text_enc, image_enc))
    backbone_before = np.asarray(
        state.image_params["backbone_conv"]["kernel"])
    emb_before = np.asarray(state.image_params["emb_features"]["kernel"])
    text_before = np.asarray(state.text_params["encoder"])
    for _ in range(3):
        state, _ = step(state, _batch(), jax.random.PRNGKey(1),
                        np.float32(2e-3))
    np.testing.assert_array_equal(
        np.asarray(state.image_params["backbone_conv"]["kernel"]),
        backbone_before)
    assert np.abs(np.asarray(state.image_params["emb_features"]["kernel"])
                  - emb_before).max() > 0
    assert np.abs(np.asarray(state.text_params["encoder"])
                  - text_before).max() > 0


def test_damsm_eval_fn_runs_f32():
    text_enc, image_enc, state = _setup()
    eval_fn = jax.jit(make_damsm_eval_fn(text_enc, image_enc))
    m = eval_fn(state, _batch(seed=3))
    for v in m.values():
        assert v.dtype == jnp.float32
        assert np.isfinite(float(v))


def test_damsm_lr_schedule():
    from multiple_objects_gan_tpu.cli.damsm_runner import damsm_lr

    assert damsm_lr(0.002, 0) == 0.002
    assert np.isclose(damsm_lr(0.002, 1), 0.002 * 0.98)
    # floors at base/10 (0.98^114 < 0.1)
    assert damsm_lr(0.002, 200) == 0.0002


def test_text_encoder_export_import_roundtrip(tmp_path):
    from multiple_objects_gan_tpu.io.damsm_export import export_text_encoder
    from multiple_objects_gan_tpu.io.damsm_import import import_text_encoder

    enc = RNNEncoder(ntoken=30, ninput=12, nhidden=16)
    caps = jnp.ones((2, 5), jnp.int32)
    lens = jnp.full((2,), 5, jnp.int32)
    vars0 = enc.init(jax.random.PRNGKey(0), caps, lens, train=False)
    path = str(tmp_path / "text_encoder0.pth")
    export_text_encoder(vars0, path)

    vars1 = enc.init(jax.random.PRNGKey(9), caps, lens, train=False)
    restored = import_text_encoder(path, vars1)
    jax.tree.map(np.testing.assert_allclose, vars0["params"],
                 restored["params"])
    # and the loaded encoder produces identical outputs
    w0, s0 = enc.apply(vars0, caps, lens, train=False)
    w1, s1 = enc.apply(restored, caps, lens, train=False)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1))


def test_image_encoder_export_import_roundtrip(tmp_path):
    """Full CNNEncoder tree: the exporter's inverse key mapping must cover
    every conv/bn/emb leaf (the importer side is value-parity-tested in
    test_cnn_encoder_parity.py)."""
    from multiple_objects_gan_tpu.io.damsm_export import (
        export_image_encoder)
    from multiple_objects_gan_tpu.io.damsm_import import (
        import_image_encoder)
    from multiple_objects_gan_tpu.nn.encoders import CNNEncoder

    enc = CNNEncoder(nef=16)
    img = jnp.zeros((1, 32, 32, 3))
    vars0 = jax.jit(lambda r: enc.init(r, img, train=False))(
        jax.random.PRNGKey(0))
    path = str(tmp_path / "image_encoder0.pth")
    export_image_encoder(vars0, path)

    vars1 = jax.jit(lambda r: enc.init(r, img, train=False))(
        jax.random.PRNGKey(7))
    restored = import_image_encoder(path, vars1)
    jax.tree.map(np.testing.assert_allclose, vars0["params"],
                 restored["params"])
    jax.tree.map(np.testing.assert_allclose, vars0["batch_stats"],
                 restored["batch_stats"])


def test_torchvision_backbone_skip_prefixes(tmp_path):
    """A torchvision-style state_dict (with AuxLogits./fc.) loads when the
    extra modules are skipped, and must not pollute the param tree."""
    import torch

    from multiple_objects_gan_tpu.io.damsm_export import (
        export_image_encoder)
    from multiple_objects_gan_tpu.io.damsm_import import (
        import_image_encoder)
    from multiple_objects_gan_tpu.nn.encoders import CNNEncoder

    enc = CNNEncoder(nef=16)
    img = jnp.zeros((1, 32, 32, 3))
    vars0 = jax.jit(lambda r: enc.init(r, img, train=False))(
        jax.random.PRNGKey(0))
    path = str(tmp_path / "tv_inception.pth")
    export_image_encoder(vars0, path)
    sd = torch.load(path, weights_only=False)
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(1, 1, 1, 1)
    sd["fc.weight"] = torch.zeros(1000, 2048)
    sd["fc.bias"] = torch.zeros(1000)
    torch.save(sd, path)

    restored = import_image_encoder(path, vars0,
                                    skip_prefixes=("AuxLogits.", "fc."))
    assert "AuxLogits" not in restored["params"]
    assert "fc" not in restored["params"]
    jax.tree.map(np.testing.assert_allclose, vars0["params"],
                 restored["params"])


def test_damsm_cli_smoke(tmp_path):
    """1-epoch `--variant damsm` CLI run on synthetic data: trains, writes
    orbax state + reference-format .pth encoders, and the .pth round-trips
    through the attngan NET_E import path."""
    import yaml

    from multiple_objects_gan_tpu.cli.main import main as cli_main

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "cfg", "coco_damsm.yml")) as f:
        cfg = yaml.safe_load(f)
    # tiny: 64px single branch, batch 4 (> test split of 2 items -> the
    # per-epoch eval pass is skipped, sparing a second Inception compile)
    cfg["TREE"] = {"BASE_SIZE": 64, "BRANCH_NUM": 1}
    cfg["TRAIN"]["BATCH_SIZE"] = 4
    cfg["TRAIN"]["MAX_EPOCH"] = 1
    cfg["TRAIN"]["SNAPSHOT_INTERVAL"] = 1
    cfg["WORKERS"] = 2
    cfg_path = str(tmp_path / "damsm_tiny.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    data = str(tmp_path / "data")
    imgs = str(tmp_path / "imgs")
    out = str(tmp_path / "out")
    cli_main(["--variant", "damsm", "--cfg", cfg_path, "--data_dir", data,
              "--img_dir", imgs, "--output_dir", out, "--synthetic",
              "--manualSeed", "3"])

    enc_dir = os.path.join(out, "DAMSMencoders")
    text_pth = os.path.join(enc_dir, "text_encoder0.pth")
    img_pth = os.path.join(enc_dir, "image_encoder0.pth")
    assert os.path.isfile(text_pth) and os.path.isfile(img_pth)
    assert os.path.isdir(os.path.join(out, "models"))
    assert os.path.isfile(os.path.join(out, "logs", "metrics.jsonl"))

    # the exported .pth loads through the attngan NET_E import path
    from multiple_objects_gan_tpu.io.damsm_import import import_text_encoder
    from multiple_objects_gan_tpu.data.attngan import AttnGanDataset
    ds = AttnGanDataset(data, imgs, split="train", base_size=64,
                        branch_num=1, words_num=12)
    enc = RNNEncoder(ntoken=ds.n_words, nhidden=256)
    caps = jnp.ones((2, 12), jnp.int32)
    lens = jnp.full((2,), 12, jnp.int32)
    v = enc.init(jax.random.PRNGKey(0), caps, lens, train=False)
    restored = import_text_encoder(text_pth, v)
    w, s = enc.apply(restored, caps, lens, train=False)
    assert np.isfinite(np.asarray(w, np.float32)).all()
    assert np.isfinite(np.asarray(s, np.float32)).all()
