"""Synthetic data generators for tests and benchmarks.

Produce batches with the exact shapes/dtypes/value-conventions of the real
pipelines (images in [-1, 1] after the reference's Normalize(0.5, 0.5) —
code/multi-mnist/main.py:80-82; bboxes normalized to [0, 1] with -1 padding
for absent objects — code/clevr/miscc/datasets.py:100-107).
"""

from __future__ import annotations

import numpy as np

from multiple_objects_gan_tpu.models.common import Stage1Config


def synthetic_batch(cfg: Stage1Config, batch_size: int, seed: int = 0,
                    imsize: int = 64) -> dict:
    """One batch of plausible data for any stage-1 variant."""
    rng = np.random.RandomState(seed)
    b, o = batch_size, cfg.num_objects

    x = rng.uniform(0.05, 0.55, size=(b, o)).astype(np.float32)
    y = rng.uniform(0.05, 0.55, size=(b, o)).astype(np.float32)
    w = rng.uniform(0.2, 0.4, size=(b, o)).astype(np.float32)
    h = rng.uniform(0.2, 0.4, size=(b, o)).astype(np.float32)
    bbox = np.stack([x, y, w, h], axis=-1)

    cls = rng.randint(0, cfg.label_dim, size=(b, o))
    onehot = np.zeros((b, o, cfg.label_dim), np.float32)
    onehot[np.arange(b)[:, None], np.arange(o)[None, :], cls] = 1.0

    # paint soft blobs inside the bboxes so D has something spatial to learn
    img = np.full((b, imsize, imsize, cfg.img_channels), -1.0, np.float32)
    yy = np.linspace(0, 1, imsize, dtype=np.float32)
    for i in range(b):
        for j in range(o):
            mx = (yy[None, :] > x[i, j]) & (yy[None, :] < x[i, j] + w[i, j])
            my = (yy[:, None] > y[i, j]) & (yy[:, None] < y[i, j] + h[i, j])
            img[i, my & mx, :] = 1.0

    batch = {"image": img, "bbox": bbox, "label_onehot": onehot}
    if cfg.use_ca:
        batch["text_embedding"] = rng.randn(b, cfg.text_dim).astype(np.float32)
    return batch
