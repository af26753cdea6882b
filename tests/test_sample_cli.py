"""Sampling-path helpers (layout surgery, captions)."""

import numpy as np

from multiple_objects_gan_tpu.cli.sample import (
    _caption_lines,
    _layout_surgery,
)


def test_layout_surgery_truncate():
    lab = np.eye(10, dtype=np.float32)[:3]
    bb = np.tile(np.array([0.2, 0.2, 0.3, 0.3], np.float32), (3, 1))
    rnd = np.random.RandomState(0)
    l2, b2 = _layout_surgery(lab, bb, 2, rnd, 10)
    assert l2.shape == (2, 10) and b2.shape == (2, 4)


def test_layout_surgery_extend():
    lab = np.eye(10, dtype=np.float32)[:3]
    bb = np.tile(np.array([0.2, 0.2, 0.3, 0.3], np.float32), (3, 1))
    rnd = np.random.RandomState(0)
    l5, b5 = _layout_surgery(lab, bb, 5, rnd, 10)
    assert l5.shape == (5, 10) and b5.shape == (5, 4)
    assert np.all(l5.sum(-1) == 1.0)        # new labels are one-hot
    assert np.all(b5[3:] >= 0.0) and np.all(b5[3:, :2] <= 0.7)


def test_caption_lines():
    lab = np.zeros((2, 10), np.float32)
    lab[0, 7] = 1.0
    lab[1, 3] = 1.0
    assert _caption_lines(lab, "multi-mnist") == ["7", "3"]
    clab = np.zeros((1, 13), np.float32)
    clab[0, 2] = 1.0   # sphere
    clab[0, 4 + 1] = 1.0  # red
    assert _caption_lines(clab, "clevr") == ["red sphere"]
