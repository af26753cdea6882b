"""Sampling-path helpers (layout surgery, captions, 20-tile composition)."""

import numpy as np

from multiple_objects_gan_tpu.cli.sample import (
    _caption_lines,
    _draw_white_bbox_edges,
    _layout_surgery,
    _text_tiles,
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


def test_text_tiles_shape_and_chunking():
    tiles = _text_tiles(["3", "5", "7"], 64)
    assert tiles.shape == (10, 64, 64, 3)
    # white background everywhere except the text in the first tiles
    assert np.all(tiles[-1] == 1.0)
    assert tiles[0].min() < 1.0


def test_draw_white_bbox_edges():
    tiles = np.zeros((10, 64, 64, 3), np.float32) - 1.0
    bb = np.array([[0.25, 0.25, 0.5, 0.5],
                   [-1.0, -1.0, -1.0, -1.0]], np.float32)
    _draw_white_bbox_edges(tiles, bb, 64)
    assert np.all(tiles[:, 16, 16:48] == 1.0)   # top edge on every tile
    assert np.all(tiles[:, 16:48, 16] == 1.0)   # left edge
    assert tiles[0, 0, 0, 0] == -1.0            # background untouched


def test_caption_lines():
    lab = np.zeros((2, 10), np.float32)
    lab[0, 7] = 1.0
    lab[1, 3] = 1.0
    assert _caption_lines(lab, "multi-mnist") == ["7", "3"]
    clab = np.zeros((1, 13), np.float32)
    clab[0, 2] = 1.0   # sphere
    clab[0, 4 + 1] = 1.0  # red
    assert _caption_lines(clab, "clevr") == ["red sphere"]


def test_cli_surgery_flags_plumb_through():
    """--num_objects / --bbox_scale reach sample_stage1's surgery kwargs
    (checked via the args-override logic, no model run needed)."""
    import argparse

    from multiple_objects_gan_tpu.cli.main import parse_args

    args = parse_args(["--variant", "multi-mnist", "--cfg", "cfg/mnist_eval.yml",
                       "--num_objects", "5", "--bbox_scale", "1.5"])
    assert args.num_objects == 5 and args.bbox_scale == 1.5
    args2 = parse_args(["--variant", "multi-mnist", "--cfg", "cfg/mnist_eval.yml"])
    assert args2.num_objects is None and args2.bbox_scale is None
