"""Layout-fidelity evaluation: the in-repo analog of the paper's YOLOv3
check (ref /root/reference/index.md:205-207 — the repo's only published
quantitative claim is a detection-based measure that generated objects
appear at their conditioned locations with their conditioned identity).

Two scores over generated images + the layouts they were conditioned on:

* **per-label recall** — a small trained digit classifier is applied to
  STN-extracted bbox crops (ops/stn.py:stn_extract_multi, the same
  canonical-grid extraction the discriminator's object pathway uses, ref
  miscc/utils.py:52-68) and its argmax is compared to the conditioned
  label. Reported overall and per class.
* **localization IoU** — for each object, the tightest bounding box of
  above-threshold luminance inside a window around the conditioned box,
  IoU'd against the conditioned box. Content rendered at the wrong place
  or spilling outside its box drives this down even when the classifier
  still recognizes the crop.

The classifier is trained ON THE FLY against the synthetic renderer
(data/datasets.py:_digit_patch — the same 10 glyph bitmaps the hardened
synthetic datasets draw), through the SAME stn_extract_multi pipeline it
will be evaluated through, so train/eval distributions match by
construction. CPU-trainable in seconds; no stored weights.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.ops.stn import stn_extract_multi

CROP = 16  # canonical crop grid — the D object pathway's resolution


@dataclasses.dataclass
class DigitClassifier:
    """Tiny 2-layer MLP over flattened canonical crops."""

    params: dict
    crop: int = CROP

    def logits(self, crops: jnp.ndarray) -> jnp.ndarray:
        """(N, crop, crop) luminance in [-1, 1] -> (N, 10)."""
        x = crops.reshape(crops.shape[0], -1).astype(jnp.float32)
        h = jax.nn.relu(x @ self.params["w1"] + self.params["b1"])
        return h @ self.params["w2"] + self.params["b2"]


def _render_batch(rs: np.random.RandomState, n: int, imsize: int = 64):
    """Render n single-digit canvases exactly like the synthetic writer
    (data/datasets.py:write_synthetic_multimnist) and return
    (images (n, s, s, 1) in [-1, 1], bbox (n, 1, 4), labels (n,))."""
    from multiple_objects_gan_tpu.data.datasets import _digit_patch

    imgs = np.zeros((n, imsize, imsize, 1), np.float32)
    bbox = np.zeros((n, 1, 4), np.float32)
    labels = rs.randint(0, 10, n)
    for i in range(n):
        w = rs.uniform(0.2, 0.33)
        h = rs.uniform(0.2, 0.33)
        x = rs.uniform(0.0, 1.0 - w)
        y = rs.uniform(0.0, 1.0 - h)
        x0, y0 = int(x * imsize), int(y * imsize)
        x1, y1 = int((x + w) * imsize), int((y + h) * imsize)
        patch = _digit_patch(int(labels[i]), y1 - y0, x1 - x0)
        imgs[i, y0:y1, x0:x1, 0] = patch.astype(np.float32)
        bbox[i, 0] = [x, y, w, h]
    imgs = imgs / 127.5 - 1.0
    return imgs, bbox, labels


def train_digit_classifier(seed: int = 0, steps: int = 400,
                           batch: int = 128, lr: float = 1e-2,
                           crop: int = CROP) -> DigitClassifier:
    """Fit the tiny MLP on renderer output seen THROUGH the stn crop
    pipeline (plus light noise so slightly blurry GAN output still
    classifies). Converges to ~100% clean accuracy in a few seconds."""
    rs = np.random.RandomState(seed)
    rng = jax.random.PRNGKey(seed)
    d_in = crop * crop
    k1, k2 = jax.random.split(rng)
    params = {
        "w1": jax.random.normal(k1, (d_in, 64)) * np.sqrt(2.0 / d_in),
        "b1": jnp.zeros((64,)),
        "w2": jax.random.normal(k2, (64, 10)) * np.sqrt(2.0 / 64),
        "b2": jnp.zeros((10,)),
    }

    def loss_fn(p, x, y):
        clf = DigitClassifier(p, crop)
        lg = clf.logits(x)
        return -jnp.mean(
            jax.nn.log_softmax(lg)[jnp.arange(x.shape[0]), y])

    @jax.jit
    def step(p, x, y):
        g = jax.grad(loss_fn)(p, x, y)
        return jax.tree.map(lambda a, b: a - lr * b, p, g)

    extract = jax.jit(
        lambda im, bb: stn_extract_multi(im, bb, (crop, crop)))
    for i in range(steps):
        imgs, bbox, labels = _render_batch(rs, batch)
        crops = extract(jnp.asarray(imgs), jnp.asarray(bbox))[:, 0, :, :, 0]
        crops = crops + 0.1 * rs.randn(*crops.shape).astype(np.float32)
        params = step(params, crops, jnp.asarray(labels))
    return DigitClassifier(jax.device_get(params), crop)


def _render_clevr_batch(rs: np.random.RandomState, n: int,
                        imsize: int = 64):
    """Render n single-object CLEVR-style canvases exactly like the
    synthetic writer (data/datasets.py:write_synthetic_clevr — palette
    colors, cube=filled box / sphere=disc / cylinder=capsule masks) and
    return (images (n, s, s, 3) in [-1, 1], bbox (n, 1, 4),
    shape_ids (n,), color_ids (n,))."""
    from multiple_objects_gan_tpu.data.datasets import (
        CLEVR_COLORS, CLEVR_SHAPES)

    palette = {"gray": (128, 128, 128), "red": (200, 30, 30),
               "blue": (40, 60, 200), "green": (30, 160, 60),
               "brown": (140, 90, 40), "purple": (130, 40, 160),
               "cyan": (40, 180, 190), "yellow": (210, 200, 40)}
    shapes = list(CLEVR_SHAPES)
    colors = list(CLEVR_COLORS)
    imgs = np.zeros((n, imsize, imsize, 3), np.float32)
    bbox = np.zeros((n, 1, 4), np.float32)
    shape_ids = rs.randint(0, len(shapes), n)
    color_ids = rs.randint(0, len(colors), n)
    for i in range(n):
        w = h = rs.randint(imsize // 6, imsize // 3)
        x0 = rs.randint(0, imsize - w)
        y0 = rs.randint(0, imsize - h)
        yy, xx = np.indices((h, w)).astype(np.float32)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        shape = shapes[shape_ids[i]]
        if shape == "sphere":
            mask = (((yy - cy) / max(cy, 1)) ** 2
                    + ((xx - cx) / max(cx, 1)) ** 2) <= 1.0
        elif shape == "cylinder":
            mask = np.abs(xx - cx) <= (w * 0.3)
        else:  # cube
            mask = np.ones((h, w), bool)
        imgs[i, y0:y0 + h, x0:x0 + w][mask] = palette[colors[color_ids[i]]]
        bbox[i, 0] = [x0 / imsize, y0 / imsize, w / imsize, h / imsize]
    imgs = imgs / 127.5 - 1.0
    return imgs, bbox, shape_ids, color_ids


@dataclasses.dataclass
class ClevrClassifier:
    """Tiny MLP over flattened RGB canonical crops with two softmax
    heads: shape (3-way) and color (8-way)."""

    params: dict
    crop: int = CROP

    def logits(self, crops: jnp.ndarray) -> tuple:
        """(N, crop, crop, 3) in [-1, 1] -> ((N, 3) shape, (N, 8) color)."""
        x = crops.reshape(crops.shape[0], -1).astype(jnp.float32)
        h = jax.nn.relu(x @ self.params["w1"] + self.params["b1"])
        out = h @ self.params["w2"] + self.params["b2"]
        return out[:, :3], out[:, 3:]


def train_clevr_classifier(seed: int = 0, steps: int = 400,
                           batch: int = 128, lr: float = 1e-2,
                           crop: int = CROP) -> ClevrClassifier:
    """Fit the shape+color classifier on renderer output seen through
    the stn crop pipeline (same recipe as train_digit_classifier)."""
    rs = np.random.RandomState(seed)
    rng = jax.random.PRNGKey(seed)
    d_in = crop * crop * 3
    k1, k2 = jax.random.split(rng)
    params = {
        "w1": jax.random.normal(k1, (d_in, 64)) * np.sqrt(2.0 / d_in),
        "b1": jnp.zeros((64,)),
        "w2": jax.random.normal(k2, (64, 11)) * np.sqrt(2.0 / 64),
        "b2": jnp.zeros((11,)),
    }

    def loss_fn(p, x, ys, yc):
        clf = ClevrClassifier(p, crop)
        ls, lc = clf.logits(x)
        n = jnp.arange(x.shape[0])
        return -(jnp.mean(jax.nn.log_softmax(ls)[n, ys])
                 + jnp.mean(jax.nn.log_softmax(lc)[n, yc]))

    @jax.jit
    def step(p, x, ys, yc):
        g = jax.grad(loss_fn)(p, x, ys, yc)
        return jax.tree.map(lambda a, b: a - lr * b, p, g)

    extract = jax.jit(
        lambda im, bb: stn_extract_multi(im, bb, (crop, crop)))
    for i in range(steps):
        imgs, bbox, ys, yc = _render_clevr_batch(rs, batch)
        crops = np.asarray(extract(jnp.asarray(imgs),
                                   jnp.asarray(bbox)))[:, 0]
        crops = crops + 0.1 * rs.randn(*crops.shape).astype(np.float32)
        params = step(params, jnp.asarray(crops), jnp.asarray(ys),
                      jnp.asarray(yc))
    return ClevrClassifier(jax.device_get(params), crop)


def clevr_layout_fidelity(images, bbox, labels,
                          clf: ClevrClassifier | None = None) -> dict:
    """Score generated clevr images against their conditioning layout.

    images: (B, H, W, 3) in [-1, 1]; bbox: (B, O, 4) normalized xywh
    (rows with w <= 0 are padding); labels: (B, O, 13) multi-hot in the
    dataset encoding (data/datasets.py:163-169 — shape one-hot in
    [0:3], color one-hot in [4:12]). Returns {"recall_shape",
    "recall_color", "recall_both", "loc_iou", "n_objects"}.
    """
    images = np.asarray(images, np.float32)
    bbox = np.asarray(bbox, np.float32)
    labels = np.asarray(labels, np.float32)
    if clf is None:
        clf = train_clevr_classifier()
    extract = jax.jit(lambda im, bb: stn_extract_multi(
        im, bb, (clf.crop, clf.crop)))
    crops = np.asarray(extract(jnp.asarray(images), jnp.asarray(bbox)))
    b, o = bbox.shape[:2]
    ls, lc = clf.logits(jnp.asarray(
        crops.reshape(b * o, clf.crop, clf.crop, 3)))
    pred_s = np.asarray(ls).argmax(-1).reshape(b, o)
    pred_c = np.asarray(lc).argmax(-1).reshape(b, o)
    true_s = labels[..., 0:3].argmax(-1)
    true_c = labels[..., 4:12].argmax(-1)
    valid = (bbox[..., 2] > 0) & (labels[..., 0:3].sum(-1) > 0)
    n_valid = int(valid.sum())
    hit_s = (pred_s == true_s) & valid
    hit_c = (pred_c == true_c) & valid
    lum = _luminance(images)
    ious = [
        _loc_iou(lum[i], bbox[i, j], thr=0.2)
        for i in range(b) for j in range(o) if valid[i, j]
    ]
    return {
        "recall_shape": round(float(hit_s.sum() / max(n_valid, 1)), 3),
        "recall_color": round(float(hit_c.sum() / max(n_valid, 1)), 3),
        "recall_both": round(
            float((hit_s & hit_c).sum() / max(n_valid, 1)), 3),
        "loc_iou": round(float(np.mean(ious)) if ious else 0.0, 3),
        "n_objects": n_valid,
    }


def _luminance(images: np.ndarray) -> np.ndarray:
    """(B, H, W, C) in [-1, 1] -> (B, H, W) luminance in [0, 1]."""
    return (np.asarray(images, np.float32).mean(-1) + 1.0) / 2.0


def _loc_iou(lum: np.ndarray, bb: np.ndarray, thr: float = 0.35,
             pad: float = 0.5) -> float:
    """IoU between the conditioned box and the tightest box of
    above-threshold luminance inside a (1 + 2*pad)-padded window of it.
    No mass in the window -> 0 (the object was not rendered there)."""
    h, w = lum.shape
    x, y, bw, bh = float(bb[0]), float(bb[1]), float(bb[2]), float(bb[3])
    wx0 = max(0, int((x - pad * bw) * w))
    wy0 = max(0, int((y - pad * bh) * h))
    wx1 = min(w, int(np.ceil((x + bw * (1 + pad)) * w)))
    wy1 = min(h, int(np.ceil((y + bh * (1 + pad)) * h)))
    win = lum[wy0:wy1, wx0:wx1] > thr
    ys, xs = np.nonzero(win)
    if ys.size == 0:
        return 0.0
    px0, px1 = (wx0 + xs.min()) / w, (wx0 + xs.max() + 1) / w
    py0, py1 = (wy0 + ys.min()) / h, (wy0 + ys.max() + 1) / h
    ix0, iy0 = max(px0, x), max(py0, y)
    ix1, iy1 = min(px1, x + bw), min(py1, y + bh)
    inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
    union = (px1 - px0) * (py1 - py0) + bw * bh - inter
    return inter / union if union > 0 else 0.0


def layout_fidelity(images, bbox, labels,
                    clf: DigitClassifier | None = None,
                    extract: Callable | None = None) -> dict:
    """Score generated images against their conditioning layout.

    images: (B, H, W, C) in [-1, 1]; bbox: (B, O, 4) normalized xywh
    (rows with w <= 0 are padding); labels: (B, O) class ids or
    (B, O, L) one-hots. Returns {"recall", "per_label_recall",
    "loc_iou", "n_objects"}.
    """
    images = np.asarray(images, np.float32)
    bbox = np.asarray(bbox, np.float32)
    labels = np.asarray(labels)
    if labels.ndim == 3:
        labels = labels.argmax(-1)
    if clf is None:
        clf = train_digit_classifier()
    if extract is None:
        extract = jax.jit(lambda im, bb: stn_extract_multi(
            im, bb, (clf.crop, clf.crop)))

    # classifier input is single-channel luminance in [-1, 1]
    lum_m1 = _luminance(images) * 2.0 - 1.0
    crops = np.asarray(extract(jnp.asarray(lum_m1[..., None]),
                               jnp.asarray(bbox)))[..., 0]
    b, o = bbox.shape[:2]
    preds = np.asarray(
        clf.logits(jnp.asarray(crops.reshape(b * o, clf.crop, clf.crop)))
    ).argmax(-1).reshape(b, o)

    valid = bbox[..., 2] > 0
    hits = (preds == labels) & valid
    n_valid = int(valid.sum())
    per_label = {}
    for c in range(10):
        m = (labels == c) & valid
        if m.sum():
            per_label[c] = round(float(hits[m].sum() / m.sum()), 3)
    lum = _luminance(images)
    ious = [
        _loc_iou(lum[i], bbox[i, j])
        for i in range(b) for j in range(o) if valid[i, j]
    ]
    return {
        "recall": round(float(hits.sum() / max(n_valid, 1)), 3),
        "per_label_recall": per_label,
        "loc_iou": round(float(np.mean(ious)) if ious else 0.0, 3),
        "n_objects": n_valid,
    }
