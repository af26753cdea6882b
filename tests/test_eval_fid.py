"""Tests for tools/eval_fid.py (standalone dir-vs-dir FID/IS).

The image-dir loader and CLI wiring are pinned here with the Inception
passes stubbed out (the real FID math is covered by tests/test_utils.py
on utils/metrics; the full CNNEncoder is exercised by
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


def test_load_image_dir(tmp_path):
    d = str(tmp_path / "imgs")
    _write_images(d, 5, size=48)
    # also a nested subdir (attngan sampling writes flat, but stackgan
    # grids can nest) and a non-image file to skip
    _write_images(os.path.join(d, "sub"), 2, size=16, seed=1)
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("skip me")

    out = eval_fid.load_image_dir(d, size=32)
    assert out.shape == (7, 32, 32, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0
    assert out.max() > 0.5  # random uint8 images span the range

    limited = eval_fid.load_image_dir(d, size=32, limit=3)
    assert limited.shape[0] == 3
    # sorted order -> limit is deterministic
    np.testing.assert_allclose(limited, out[:3])


def test_load_image_dir_empty(tmp_path):
    with pytest.raises(FileNotFoundError):
        eval_fid.load_image_dir(str(tmp_path), size=32)


def test_cli_end_to_end_stubbed(tmp_path, monkeypatch, capsys):
    real, fake = str(tmp_path / "real"), str(tmp_path / "fake")
    _write_images(real, 4, seed=0)
    _write_images(fake, 3, seed=1)

    seen = {}

    def fake_fid(enc, enc_vars, reals, fakes, batch):
        seen["shapes"] = (reals.shape, fakes.shape)
        return 12.5

    # stub the heavy passes at their source (main imports them locally,
    # so patching the module attribute before the call is enough)
    import multiple_objects_gan_tpu.utils.metrics as metrics
    monkeypatch.setattr(metrics, "compute_fid", fake_fid)
    monkeypatch.setattr(metrics, "inception_score",
                        lambda enc, v, imgs, b: (3.0, 0.25))

    class _StubEnc:
        def init(self, rng, img, train):
            return {"params": {}}

    import multiple_objects_gan_tpu.nn.encoders as encoders
    monkeypatch.setattr(encoders, "CNNEncoder", lambda nef: _StubEnc())

    out_json = str(tmp_path / "m.json")
    eval_fid.main([real, fake, "--size", "24", "--out", out_json])

    assert seen["shapes"] == ((4, 24, 24, 3), (3, 24, 24, 3))
    with open(out_json) as f:
        result = json.load(f)
    assert result == {"fid": 12.5, "is_mean": 3.0, "is_std": 0.25,
                      "n_real": 4, "n_fake": 3}
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last) == result
