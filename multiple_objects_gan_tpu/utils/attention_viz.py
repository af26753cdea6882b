"""Attention-map montages (AttnGAN visualization).

Parity target: build_super_images / build_super_images2 + drawCaption
(code/coco/attngan/miscc/utils.py:65-317): for each sample, a row of the
generated image followed by per-word attention overlays (word text on top,
attention map blended over the image).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image, ImageDraw

from multiple_objects_gan_tpu.utils.images import to_uint8


def _colorize(att: np.ndarray) -> np.ndarray:
    """(h, w) in [0, 1] -> red-channel heat overlay (H, W, 3) uint8."""
    att = np.clip(att, 0.0, 1.0)
    heat = np.zeros(att.shape + (3,), np.float32)
    heat[..., 0] = att * 255.0
    heat[..., 2] = (1.0 - att) * 96.0
    return heat.astype(np.uint8)


def build_attention_images(images: np.ndarray, att_maps: np.ndarray,
                           captions: np.ndarray,
                           ixtoword: Optional[dict] = None,
                           cap_lens: Optional[np.ndarray] = None,
                           max_words: int = 8, tile: int = 64) -> np.ndarray:
    """images (B, H, W, 3) in [-1, 1]; att_maps (B, h, w, T) softmax maps;
    captions (B, T) int ids. Returns one uint8 montage array."""
    b, _, _, t = att_maps.shape
    n_words = min(t, max_words)
    rows = []
    for i in range(b):
        img = np.asarray(Image.fromarray(to_uint8(images[i])).resize(
            (tile, tile), Image.BILINEAR))
        row = [img]
        length = int(cap_lens[i]) if cap_lens is not None else n_words
        for w in range(n_words):
            att = att_maps[i, :, :, w]
            att = att / max(att.max(), 1e-8)
            att_img = np.asarray(Image.fromarray(_colorize(att)).resize(
                (tile, tile), Image.BILINEAR))
            blend = (0.4 * img + 0.6 * att_img).astype(np.uint8)
            cell = Image.fromarray(blend)
            if ixtoword is not None and w < length:
                word = ixtoword.get(int(captions[i, w]), "?")
                ImageDraw.Draw(cell).text((2, 2), word[:10],
                                          fill=(255, 255, 0))
            if w >= length:
                cell = Image.fromarray((np.asarray(cell) // 3))
            row.append(np.asarray(cell))
        rows.append(np.concatenate(row, axis=1))
    return np.concatenate(rows, axis=0)


def save_attention_montage(path: str, images, att_maps, captions,
                           ixtoword=None, cap_lens=None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    montage = build_attention_images(np.asarray(images),
                                     np.asarray(att_maps),
                                     np.asarray(captions), ixtoword,
                                     np.asarray(cap_lens)
                                     if cap_lens is not None else None)
    Image.fromarray(montage).save(path)
