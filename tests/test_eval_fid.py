"""Tests for tools/eval_fid.py (standalone dir-vs-dir FID/IS).

The streaming dir->activations loader and CLI wiring are pinned here with
the Inception passes stubbed out (the real FID math is covered by
tests/test_utils.py on utils/metrics; the full CNNEncoder is exercised by
tests/test_cnn_encoder_parity.py — no need to recompile it here).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import eval_fid  # noqa: E402


def _write_images(d, n, size=32, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8)
                        ).save(os.path.join(d, f"im_{i:03d}.png"))


def test_dir_activations_streams_chunks(tmp_path, monkeypatch):
    d = str(tmp_path / "imgs")
    _write_images(d, 5, size=48)
    # also a nested subdir (attngan sampling writes flat, but stackgan
    # grids can nest) and a non-image file to skip
    _write_images(os.path.join(d, "sub"), 2, size=16, seed=1)
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("skip me")

    chunks = []

    def fake_acts(enc, enc_vars, images, batch):
        assert images.dtype == np.float32
        assert images.min() >= -1.0 and images.max() <= 1.0
        assert images.max() > 0.5  # random uint8 images span the range
        chunks.append(images.shape)
        return images.reshape(images.shape[0], -1)[:, :8].copy()

    import multiple_objects_gan_tpu.utils.metrics as metrics
    monkeypatch.setattr(metrics, "inception_activations", fake_acts)

    out = eval_fid.dir_activations(None, None, d, size=32, limit=0,
                                   batch=4, chunk=3)
    # 7 files in chunks of 3: never more than 3 frames in RAM at once
    assert chunks == [(3, 32, 32, 3), (3, 32, 32, 3), (1, 32, 32, 3)]
    assert out.shape == (7, 8)

    files = eval_fid.list_image_files(d)
    assert len(files) == 7
    assert eval_fid.list_image_files(d, limit=3) == files[:3]


def test_list_image_files_empty(tmp_path):
    with pytest.raises(FileNotFoundError):
        eval_fid.list_image_files(str(tmp_path))


def test_cli_end_to_end_stubbed(tmp_path, monkeypatch, capsys):
    real, fake = str(tmp_path / "real"), str(tmp_path / "fake")
    _write_images(real, 4, seed=0)
    _write_images(fake, 3, seed=1)

    seen = {}

    def fake_acts(enc, enc_vars, images, batch):
        return np.full((images.shape[0], 4), float(images.shape[0]),
                       np.float32)

    def fake_fid(real_acts, fake_acts):
        seen["shapes"] = (real_acts.shape, fake_acts.shape)
        return 12.5

    # stub the heavy passes at their source (main imports them locally,
    # so patching the module attribute before the call is enough)
    import multiple_objects_gan_tpu.utils.metrics as metrics
    monkeypatch.setattr(metrics, "inception_activations", fake_acts)
    monkeypatch.setattr(metrics, "fid_from_activations", fake_fid)

    def fake_is(enc, v, images=None, batch_size=32, splits=10, fc=None,
                acts=None):
        seen["is_acts"] = None if acts is None else acts.shape
        return (3.0, 0.25)

    monkeypatch.setattr(metrics, "inception_score", fake_is)

    class _StubEnc:
        def init(self, rng, img, train):
            return {"params": {}}

    import multiple_objects_gan_tpu.nn.encoders as encoders
    monkeypatch.setattr(encoders, "CNNEncoder", lambda nef: _StubEnc())

    out_json = str(tmp_path / "m.json")
    eval_fid.main([real, fake, "--size", "24", "--out", out_json])

    assert seen["shapes"] == ((4, 4), (3, 4))
    assert seen["is_acts"] == (3, 4)  # IS reuses the fake activations
    with open(out_json) as f:
        result = json.load(f)
    assert result == {"fid": 12.5, "is_mean": 3.0, "is_std": 0.25,
                      "n_real": 4, "n_fake": 3,
                      # provenance: no --image_encoder and no
                      # $INCEPTION_V3_WEIGHTS in the test env
                      "is_head": "random", "is_backbone": "random",
                      "fid_encoder": "random"}
    out = capsys.readouterr().out
    # random backbone/head: the not-publication-grade IS warning must print
    assert "IS is not comparable" in out
    last = out.strip().splitlines()[-1]
    assert json.loads(last) == result


def test_canonical_fid_without_image_encoder_warns_and_skips_is_sweep(
        tmp_path, monkeypatch, capsys):
    """--fid_weights set but --image_encoder unset: IS would run on a
    RANDOM DAMSM backbone — the warning must fire, is_backbone must say
    'random', and no wasted second Inception sweep may run (regression:
    the old fid_prov=='random'-only warning stayed silent here)."""
    real, fake = str(tmp_path / "real"), str(tmp_path / "fake")
    _write_images(real, 3, seed=0)
    _write_images(fake, 3, seed=1)

    calls = {"acts": 0}

    def fake_acts(enc, enc_vars, images, batch):
        calls["acts"] += 1
        return np.full((images.shape[0], 4), 1.0, np.float32)

    import multiple_objects_gan_tpu.utils.metrics as metrics
    monkeypatch.setattr(metrics, "inception_activations", fake_acts)
    monkeypatch.setattr(metrics, "fid_from_activations", lambda a, b: 1.0)
    monkeypatch.setattr(metrics, "inception_score",
                        lambda *a, **k: (2.0, 0.1))
    monkeypatch.setattr(
        metrics, "resolve_fid_encoder",
        lambda enc, enc_vars, provenance=None: (enc, enc_vars,
                                                "fid_canonical"))
    monkeypatch.setenv("FID_INCEPTION_WEIGHTS", "stub.pth")

    class _StubEnc:
        def init(self, rng, img, train):
            return {"params": {}}

    import multiple_objects_gan_tpu.nn.encoders as encoders
    monkeypatch.setattr(encoders, "CNNEncoder", lambda nef: _StubEnc())

    eval_fid.main([real, fake, "--size", "24"])
    out = capsys.readouterr().out
    assert "IS is not comparable" in out
    result = json.loads(out.strip().splitlines()[-1])
    assert result["fid_encoder"] == "fid_canonical"
    assert result["is_backbone"] == "random"
    # exactly 2 sweeps (real + fake) — no third pass for a random-backbone IS
    assert calls["acts"] == 2
