"""Image-grid dumps + bbox/caption annotation (host-side visualization).

Parity targets: save_img_results / pad_imgs
(code/multi-mnist/miscc/utils.py:141-157,54-56) and the sampling grids with
drawn bbox rectangles + caption text rows
(code/multi-mnist/trainer.py:307-341).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image, ImageDraw


def as_model_image(img):
    """Transport uint8 [0, 255] -> model float32 [-1, 1]; float images
    pass through unchanged.

    The data pipeline ships images as raw uint8 (the reference keeps
    uint8 through every PIL transform and only normalizes in ToTensor,
    code/multi-mnist/main.py:80-82) — 4x fewer host->device bytes. Works
    on numpy AND jax arrays: inside jit the convert fuses into the first
    consumer, so on-device normalization is free."""
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 127.5 - 1.0
    return img


def to_uint8(img: np.ndarray, from_range=(-1.0, 1.0)) -> np.ndarray:
    """(H, W, C) float in from_range -> uint8 RGB. uint8 inputs (the
    loader transport format) pass through, only gray->RGB expanded."""
    x = np.asarray(img)
    if x.dtype != np.uint8:
        lo, hi = from_range
        x = (np.asarray(x, np.float32) - lo) / (hi - lo)
        x = np.clip(x, 0.0, 1.0)
        x = (x * 255.0 + 0.5).astype(np.uint8)
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    return x


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2,
              from_range=(-1.0, 1.0)) -> np.ndarray:
    """(N, H, W, C) -> uint8 grid image with padding (vutils.save_image)."""
    n, h, w, _ = images.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.zeros((ncol * (h + pad) + pad, nrow * (w + pad) + pad, 3),
                    np.uint8)
    for i in range(n):
        r, c = divmod(i, nrow)
        y = r * (h + pad) + pad
        x = c * (w + pad) + pad
        grid[y:y + h, x:x + w] = to_uint8(images[i], from_range)
    return grid


def save_grid(images: np.ndarray, path: str, nrow: int = 8,
              from_range=(-1.0, 1.0)) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(make_grid(images, nrow=nrow, from_range=from_range)).save(path)


def draw_bboxes(img_uint8: np.ndarray, bboxes: np.ndarray,
                color=(220, 30, 30)) -> np.ndarray:
    """Draw normalized (x, y, w, h) rectangles; bbox < 0 entries skipped
    (the -1 'no object' padding)."""
    im = Image.fromarray(img_uint8)
    drw = ImageDraw.Draw(im)
    h, w = img_uint8.shape[:2]
    for bb in np.asarray(bboxes).reshape(-1, 4):
        if np.any(bb < 0):
            continue
        x0, y0 = bb[0] * w, bb[1] * h
        x1, y1 = (bb[0] + bb[2]) * w, (bb[1] + bb[3]) * h
        drw.rectangle([x0, y0, x1, y1], outline=color, width=1)
    return np.asarray(im)


def caption_tile(lines: Sequence[str], hw: tuple[int, int],
                 fill=(0, 0, 0)) -> np.ndarray:
    """Render short caption text onto a white tile (trainer.py:330-340)."""
    im = Image.new("RGB", (hw[1], hw[0]), (255, 255, 255))
    drw = ImageDraw.Draw(im)
    y = 2
    for line in lines:
        drw.text((2, y), line, fill=fill)
        y += 11
    return np.asarray(im)
