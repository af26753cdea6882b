"""Layout-fidelity eval (utils/layout_fidelity.py) — the in-repo analog
of the paper's YOLOv3 placement check (ref index.md:205-207).

Oracle: the synthetic renderer itself. On clean rendered scenes the
trained crop classifier must recover the digit identities near-perfectly
and the luminance-box IoU must be high; on label-shuffled conditioning
the recall must collapse to ~chance; on blank images both scores must be
~0 — i.e. the metric actually discriminates identity and placement.
"""

import numpy as np
import pytest

from multiple_objects_gan_tpu.utils.layout_fidelity import (
    DigitClassifier,
    _render_batch,
    layout_fidelity,
    train_digit_classifier,
)


@pytest.fixture(scope="module")
def clf() -> DigitClassifier:
    return train_digit_classifier(seed=0, steps=400)


def _scene_batch(n=48, seed=3):
    """Three-digit scenes via the single-digit renderer composited like
    the writer (max-blend)."""
    rs = np.random.RandomState(seed)
    imgs = np.full((n, 64, 64, 1), -1.0, np.float32)
    bbox = np.zeros((n, 3, 4), np.float32)
    labels = np.zeros((n, 3), np.int64)
    for j in range(3):
        im_j, bb_j, lab_j = _render_batch(rs, n)
        imgs = np.maximum(imgs, im_j)
        bbox[:, j] = bb_j[:, 0]
        labels[:, j] = lab_j
    return imgs, bbox, labels


def test_recall_high_on_clean_renders(clf):
    imgs, bbox, labels = _scene_batch()
    out = layout_fidelity(imgs, bbox, labels, clf=clf)
    assert out["n_objects"] == 48 * 3
    # overlapping digits corrupt some crops; clean scenes still score high
    assert out["recall"] > 0.85, out
    assert out["loc_iou"] > 0.4, out   # glyphs (e.g. "1") underfill boxes
    assert set(out["per_label_recall"]) == set(range(10))


def test_recall_collapses_on_shuffled_labels(clf):
    imgs, bbox, labels = _scene_batch(seed=11)
    rs = np.random.RandomState(0)
    wrong = (labels + rs.randint(1, 10, labels.shape)) % 10
    out = layout_fidelity(imgs, bbox, wrong, clf=clf)
    assert out["recall"] < 0.35, out     # ~chance, far below clean
    # placement is still correct — localization must NOT collapse
    assert out["loc_iou"] > 0.4, out


def test_scores_zero_on_blank_images(clf):
    imgs = np.full((16, 64, 64, 1), -1.0, np.float32)
    bbox = np.tile(np.asarray([0.2, 0.2, 0.3, 0.3], np.float32),
                   (16, 3, 1))
    labels = np.zeros((16, 3), np.int64)
    out = layout_fidelity(imgs, bbox, labels, clf=clf)
    assert out["loc_iou"] == 0.0


def test_padding_rows_ignored(clf):
    imgs, bbox, labels = _scene_batch(n=8, seed=5)
    bbox[:, 2] = -1.0  # third object padded out (w <= 0)
    out = layout_fidelity(imgs, bbox, labels, clf=clf)
    assert out["n_objects"] == 8 * 2


# ---- clevr analog (shape 3-way + color 8-way over RGB crops) ----

from multiple_objects_gan_tpu.utils.layout_fidelity import (  # noqa: E402
    ClevrClassifier,
    _render_clevr_batch,
    clevr_layout_fidelity,
    train_clevr_classifier,
)


@pytest.fixture(scope="module")
def cclf() -> ClevrClassifier:
    return train_clevr_classifier(seed=0, steps=400)


def _clevr_scene_batch(n=48, seed=3, objects=3):
    """Multi-object clevr scenes composited from the single-object
    renderer (overwrite-blend like the writer), labels in the 13-dim
    dataset encoding (shape [0:3] + color [4:12])."""
    rs = np.random.RandomState(seed)
    imgs = np.full((n, 64, 64, 3), -1.0, np.float32)
    bbox = np.zeros((n, objects, 4), np.float32)
    labels = np.zeros((n, objects, 13), np.float32)
    for j in range(objects):
        im_j, bb_j, ys, yc = _render_clevr_batch(rs, n)
        mask = (im_j > -1.0).any(-1, keepdims=True)
        imgs = np.where(mask, im_j, imgs)
        bbox[:, j] = bb_j[:, 0]
        labels[np.arange(n), j, ys] = 1.0
        labels[np.arange(n), j, 4 + yc] = 1.0
    return imgs, bbox, labels


def test_clevr_recall_high_on_clean_renders(cclf):
    imgs, bbox, labels = _clevr_scene_batch()
    out = clevr_layout_fidelity(imgs, bbox, labels, clf=cclf)
    assert out["n_objects"] == 48 * 3
    # later objects overdraw earlier ones; clean scenes still score high
    assert out["recall_color"] > 0.8, out
    assert out["recall_shape"] > 0.7, out
    assert out["recall_both"] > 0.6, out
    assert out["loc_iou"] > 0.4, out


def test_clevr_recall_collapses_on_shuffled_labels(cclf):
    imgs, bbox, labels = _clevr_scene_batch(seed=11)
    rs = np.random.RandomState(0)
    shifted = np.zeros_like(labels)
    ys = labels[..., 0:3].argmax(-1)
    yc = labels[..., 4:12].argmax(-1)
    b, o = ys.shape
    ys = (ys + rs.randint(1, 3, ys.shape)) % 3
    yc = (yc + rs.randint(1, 8, yc.shape)) % 8
    for i in range(b):
        for j in range(o):
            shifted[i, j, ys[i, j]] = 1.0
            shifted[i, j, 4 + yc[i, j]] = 1.0
    out = clevr_layout_fidelity(imgs, bbox, shifted, clf=cclf)
    assert out["recall_both"] < 0.25, out   # ~chance
    assert out["loc_iou"] > 0.4, out        # placement still correct


def test_clevr_padding_and_unlabeled_rows_ignored(cclf):
    imgs, bbox, labels = _clevr_scene_batch(n=8, seed=5)
    bbox[:, 1] = -1.0          # padded box (w <= 0)
    labels[:, 2, 0:3] = 0.0    # no shape hot -> not a scored object
    out = clevr_layout_fidelity(imgs, bbox, labels, clf=cclf)
    assert out["n_objects"] == 8
