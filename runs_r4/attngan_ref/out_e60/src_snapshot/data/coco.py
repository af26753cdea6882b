"""MS-COCO dataset adapter for the StackGAN variants.

Parity target: code/coco/stackgan/miscc/datasets.py:25-217:
  * <data_dir>/<split>/{filenames,bboxes,labels}.pickle +
    char-CNN-RNN-embeddings.pickle (per-image caption embeddings, one chosen
    at random per step);
  * images from <img_dir>/<key>.jpg, resized to 76 (stage 1) / 268 (stage 2)
    then random-cropped to 64 / 256 with random h-flip;
  * bbox rescaling under crop/flip (crop_imgs, :100-190) — stage 2 produces
    TWO bbox sets (64-scale for the frozen stage-1 G, 256-scale for stage-2);
  * labels are per-object category ids, -1 padded; one-hot(81) with pad -> 80
    (trainer.py:183-188).
"""

from __future__ import annotations

import os
import pickle  # dump only — all loads go through io.pycompat.load_pickle

import numpy as np
from PIL import Image

from multiple_objects_gan_tpu.io.pycompat import load_pickle

MAX_OBJECTS = 3
NUM_CLASSES = 81


def _rescale_bbox(bbox_obj, ori_size, imsize, h1, w1, flip):
    """One object's bbox under resize->crop->flip (crop_imgs math)."""
    x = max(bbox_obj[0] * float(ori_size) - h1, 0) / float(imsize)
    y = max(bbox_obj[1] * float(ori_size) - w1, 0) / float(imsize)
    w = min((float(ori_size) / imsize) * bbox_obj[2], 1.0)
    if x + w > 0.999:
        w = 1.0 - x - 0.001
    h = min((float(ori_size) / imsize) * bbox_obj[3], 1.0)
    if y + h > 0.999:
        h = 1.0 - y - 0.001
    if flip:
        x = 1.0 - x - w
    return [x, y, w, h]


def labels_to_onehot(labels: np.ndarray) -> np.ndarray:
    """(O,) or (O, 1) int ids with -1 padding -> (O, 81) one-hot, pad -> 80."""
    ids = np.asarray(labels).reshape(-1).astype(np.int64)
    ids = np.where(ids < 0, NUM_CLASSES - 1, ids)
    onehot = np.zeros((ids.shape[0], NUM_CLASSES), np.float32)
    onehot[np.arange(ids.shape[0]), ids] = 1.0
    return onehot


class CocoStackganDataset:
    """COCO pickles + JPEG dir, reference format."""

    max_objects = MAX_OBJECTS
    label_dim = NUM_CLASSES
    channels = 3

    def __init__(self, data_dir: str, img_dir: str, split: str = "train",
                 stage: int = 1, imsize: int = 64,
                 embedding_type: str = "cnn-rnn", crop: bool = True,
                 seed: int = 0):
        self.split_dir = os.path.join(data_dir, split)
        self.img_dir = img_dir
        self.stage = stage
        self.imsize = imsize
        self.crop = crop
        # resize target before random crop (main.py transform: 76 / 268)
        self.ori_size = 76 if imsize == 64 else 268
        self._rng = np.random.RandomState(seed)
        # load_pickle: the published COCO pickles (incl. the char-CNN-RNN
        # embeddings) are Python-2 cPickle
        # (code/coco/stackgan/miscc/datasets.py:81-92)
        self.filenames = load_pickle(
            os.path.join(self.split_dir, "filenames.pickle"))
        self.bboxes = np.array(
            load_pickle(os.path.join(self.split_dir, "bboxes.pickle")),
            dtype=np.float32)
        self.labels = np.array(
            load_pickle(os.path.join(self.split_dir, "labels.pickle")))
        emb_name = {"cnn-rnn": "char-CNN-RNN-embeddings.pickle",
                    "cnn-gru": "char-CNN-GRU-embeddings.pickle",
                    "skip-thought": "skip-thought-embeddings.pickle"}[
            embedding_type]
        self.embeddings = np.array(
            load_pickle(os.path.join(self.split_dir, emb_name)),
            dtype=np.float32)

    def __len__(self) -> int:
        return len(self.filenames)

    def __getitem__(self, index: int) -> dict:
        key = str(self.filenames[index])
        img = Image.open(os.path.join(self.img_dir, key + ".jpg")).convert("RGB")
        img = img.resize((self.ori_size, self.ori_size), Image.BILINEAR)
        # raw uint8 transport — crop/flip below stay uint8 like the
        # reference's PIL pipeline; normalize-on-device (as_model_image)
        arr = np.asarray(img)  # (H, W, 3) uint8

        bbox = self.bboxes[index]
        embs = self.embeddings[index]
        emb = embs[self._rng.randint(embs.shape[0])]
        onehot = labels_to_onehot(self.labels[index])

        if not self.crop:
            # no crop -> the normalized bbox applies unchanged at both scales
            out = {"image": arr, "bbox": bbox.astype(np.float32)}
            if self.stage == 2:
                out["bbox_s2"] = bbox.astype(np.float32)
        else:
            flip = self._rng.rand() < 0.5
            margin = self.ori_size - self.imsize
            h1 = int(np.floor(margin * self._rng.rand()))
            w1 = int(np.floor(margin * self._rng.rand()))
            crop = arr[w1:w1 + self.imsize, h1:h1 + self.imsize]
            if flip:
                crop = crop[:, ::-1].copy()

            if self.stage == 1:
                out = {"image": crop,
                       "bbox": self._scale_all(bbox, self.ori_size,
                                               self.imsize, h1, w1, flip)}
            else:
                out = {"image": crop,
                       "bbox": self._scale_all(bbox, 76, 64,  # stage-1 coords
                                               h1, w1, flip),
                       "bbox_s2": self._scale_all(bbox, self.ori_size,
                                                  self.imsize, h1, w1, flip)}
        out["label_onehot"] = onehot
        out["text_embedding"] = emb.astype(np.float32)
        return out

    def _scale_all(self, bbox, ori, ims, h1, w1, flip):
        out = np.full_like(bbox, -1.0, dtype=np.float32)
        for i in range(self.max_objects):
            if bbox[i][0] == -1:
                break
            out[i] = _rescale_bbox(bbox[i], ori, ims, h1, w1, flip)
        return out

    def get_batch(self, idxs, threads: int = 16) -> dict:
        """Batched fast path: native threaded JPEG decode at ori_size
        (native/loader.cpp thread pool) + vectorized crop/flip/bbox
        rescale. Same rng draw order as __getitem__."""
        from multiple_objects_gan_tpu.data.native_loader import decode_batch

        idxs = np.asarray(idxs)
        n = len(idxs)
        paths = [os.path.join(self.img_dir, str(self.filenames[i]) + ".jpg")
                 for i in idxs]
        arrs = decode_batch(paths, self.ori_size, self.ori_size, 3,
                            threads=threads, dtype=np.uint8)

        size = self.imsize if self.crop else self.ori_size
        imgs = np.empty((n, size, size, 3), np.uint8)
        bbox1 = np.empty((n, self.max_objects, 4), np.float32)
        bbox2 = (np.empty((n, self.max_objects, 4), np.float32)
                 if self.stage == 2 else None)
        embs_out = np.empty((n, self.embeddings.shape[-1]), np.float32)
        for j, i in enumerate(idxs):
            embs = self.embeddings[i]
            embs_out[j] = embs[self._rng.randint(embs.shape[0])]
            if not self.crop:
                imgs[j] = arrs[j]
                bbox1[j] = self.bboxes[i]
                if bbox2 is not None:  # same normalized coords, no crop
                    bbox2[j] = self.bboxes[i]
                continue
            flip = self._rng.rand() < 0.5
            margin = self.ori_size - self.imsize
            h1 = int(np.floor(margin * self._rng.rand()))
            w1 = int(np.floor(margin * self._rng.rand()))
            crop = arrs[j, w1:w1 + self.imsize, h1:h1 + self.imsize]
            imgs[j] = crop[:, ::-1] if flip else crop
            bb = self.bboxes[i]
            if self.stage == 1:
                bbox1[j] = self._scale_all(bb, self.ori_size, self.imsize,
                                           h1, w1, flip)
            else:
                bbox1[j] = self._scale_all(bb, 76, 64, h1, w1, flip)
                bbox2[j] = self._scale_all(bb, self.ori_size, self.imsize,
                                           h1, w1, flip)
        out = {"image": imgs, "bbox": bbox1,
               "label_onehot": np.stack(
                   [labels_to_onehot(self.labels[i]) for i in idxs]),
               "text_embedding": embs_out}
        if bbox2 is not None:
            out["bbox_s2"] = bbox2
        return out


def write_synthetic_coco(data_dir: str, img_dir: str, n: int = 64,
                         split: str = "train", seed: int = 0,
                         n_captions: int = 5, text_dim: int = 1024) -> None:
    """Tiny COCO-format dataset to exercise the IO path. Objects are drawn
    as label-colored rectangles at their bbox locations on a dark
    background, so short smoke trainings have real signal to learn (the
    object pathway can be validated with an in-box intensity check)."""
    rng = np.random.RandomState(seed)
    split_dir = os.path.join(data_dir, split)
    os.makedirs(split_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)
    filenames, bboxes, labels, embs = [], [], [], []
    for i in range(n):
        key = f"synthetic_{i:06d}"
        img = (rng.rand(96, 96, 3) * 40).astype(np.uint8)  # dark noise bg
        filenames.append(key)
        n_obj = rng.randint(1, MAX_OBJECTS + 1)
        bb = np.full((MAX_OBJECTS, 4), -1.0, np.float32)
        lab = np.full((MAX_OBJECTS, 1), -1, np.int64)
        for j in range(n_obj):
            w, h = rng.uniform(0.2, 0.4, 2)
            bb[j] = [rng.uniform(0, 1 - w), rng.uniform(0, 1 - h), w, h]
            lab[j] = rng.randint(0, NUM_CLASSES - 1)
            # label-dependent bright color at the bbox location
            x0, y0 = int(bb[j][0] * 96), int(bb[j][1] * 96)
            x1, y1 = int((bb[j][0] + bb[j][2]) * 96), int(
                (bb[j][1] + bb[j][3]) * 96)
            lab_j = int(lab[j, 0])
            color = np.array([120 + 135 * ((lab_j * k) % 9) // 8
                              for k in (1, 2, 3)], np.uint8)
            img[y0:y1, x0:x1] = color
        Image.fromarray(img).save(os.path.join(img_dir, key + ".jpg"))
        bboxes.append(bb)
        labels.append(lab)
        embs.append(rng.randn(n_captions, text_dim).astype(np.float32))
    for name, obj in [("filenames.pickle", filenames),
                      ("bboxes.pickle", np.stack(bboxes)),
                      ("labels.pickle", np.stack(labels)),
                      ("char-CNN-RNN-embeddings.pickle", np.stack(embs))]:
        with open(os.path.join(split_dir, name), "wb") as f:
            pickle.dump(obj, f)
    if split == "test":
        # the reference eval reads val_captions.t7 (torch-lua) for caption
        # strings + embeddings (trainer.py:300-302); emit a real one so
        # the t7 code path is exercised end to end on synthetic data
        from multiple_objects_gan_tpu.io.torchfile import save as t7_save
        t7_save(os.path.join(split_dir, "val_captions.t7"),
                {"raw_txt": [f"synthetic caption {i}" for i in range(n)],
                 "fea_txt": [e[:1] for e in embs]})
