"""Image grids, attention montages, FID math."""

import numpy as np

from multiple_objects_gan_tpu.utils.attention_viz import (
    build_attention_images,
)
from multiple_objects_gan_tpu.utils.images import (
    caption_tile,
    draw_bboxes,
    make_grid,
    to_uint8,
)
from multiple_objects_gan_tpu.utils.metrics import fid_from_activations


def test_to_uint8_range():
    img = np.array([[[-1.0], [0.0], [1.0]]], np.float32)
    out = to_uint8(img)
    assert out.shape == (1, 3, 3)
    assert out[0, 0, 0] == 0 and out[0, 2, 0] == 255


def test_make_grid_shape():
    imgs = np.zeros((10, 8, 8, 3), np.float32)
    grid = make_grid(imgs, nrow=4, pad=2)
    assert grid.shape == (3 * 10 + 2, 4 * 10 + 2, 3)


def test_draw_bboxes_skips_padding():
    img = np.zeros((32, 32, 3), np.uint8)
    out = draw_bboxes(img, np.array([[0.25, 0.25, 0.5, 0.5],
                                     [-1, -1, -1, -1]], np.float32))
    assert out.sum() > 0  # one rectangle drawn


def test_caption_tile():
    tile = caption_tile(["7", "3"], (64, 64))
    assert tile.shape == (64, 64, 3)
    assert (tile < 255).any()  # some text pixels


def test_attention_montage_shape():
    b, t = 2, 5
    imgs = np.random.RandomState(0).randn(b, 64, 64, 3).clip(-1, 1)
    atts = np.abs(np.random.RandomState(1).randn(b, 8, 8, t))
    caps = np.ones((b, t), np.int32)
    monty = build_attention_images(imgs, atts, caps,
                                   ixtoword={1: "cat"},
                                   cap_lens=np.array([3, 5]))
    assert monty.shape == (2 * 64, (1 + 5) * 64, 3)


def test_fid_zero_for_identical_and_positive_for_shifted():
    rng = np.random.RandomState(0)
    a = rng.randn(500, 16).astype(np.float64)
    assert abs(fid_from_activations(a, a.copy())) < 1e-6
    b = a + 2.0
    fid = fid_from_activations(a, b)
    assert fid > 50.0  # ||diff||^2 = 16 * 4 = 64 plus cov terms
