"""AttnGAN COCO dataset adapter: captions + multi-scale images + layouts.

Parity target: code/coco/attngan/datasets.py:
  * caption pipeline (:192-291): per-image text files tokenized with a
    \\w+ regex, lowercased, ascii-filtered; vocab built over train+test
    with <end>=0; cached to <data_dir>/captions.pickle;
  * get_caption (:311-329): pad/truncate to TEXT.WORDS_NUM (random sorted
    subsample when too long);
  * get_imgs/crop_imgs (:71-137): resize to 268, random 256 crop + h-flip
    with bbox rescale, then downscale to 64/128(/256) per branch;
  * labels -> one-hot(81) with -1 -> 80 (:341-349); class ids from
    class_info.pickle or arange (:297-303).

The reference's sort-by-length collation (prepare_data, :28-68) is dropped:
our LSTM is mask-based, so batches stay in natural order.
"""

from __future__ import annotations

import os
import pickle
import re
from collections import defaultdict

import numpy as np
from PIL import Image

from multiple_objects_gan_tpu.data.coco import labels_to_onehot
from multiple_objects_gan_tpu.io.pycompat import load_pickle

MAX_OBJECTS = 3
_TOKEN_RE = re.compile(r"\w+")


def tokenize(caption: str) -> list[str]:
    toks = _TOKEN_RE.findall(caption.lower().replace("��", " "))
    out = []
    for t in toks:
        t = t.encode("ascii", "ignore").decode("ascii")
        if t:
            out.append(t)
    return out


def load_captions(data_dir: str, filenames, captions_per_image: int):
    all_captions = []
    for name in filenames:
        path = os.path.join(data_dir, "text", f"{name}.txt")
        with open(path, encoding="utf-8") as f:
            raw = f.read().split("\n")
        cnt = 0
        for cap in raw:
            if not cap:
                continue
            tokens = tokenize(cap)
            if not tokens:
                continue
            all_captions.append(tokens)
            cnt += 1
            if cnt == captions_per_image:
                break
        if cnt < captions_per_image:
            # hard error where the reference only prints one
            # (datasets.py:258-259): the flat caption list is indexed as
            # index * captions_per_image + sent_ix, so a short file would
            # silently mispair captions with every SUBSEQUENT image
            raise ValueError(
                f"ERROR: the captions for {name} less than "
                f"{captions_per_image} ({cnt}) — the flat caption index "
                "would misalign all later images")
    return all_captions


def build_dictionary(train_captions, test_captions):
    word_counts: dict = defaultdict(float)
    for sent in train_captions + test_captions:
        for w in sent:
            word_counts[w] += 1
    ixtoword = {0: "<end>"}
    wordtoix = {"<end>": 0}
    for ix, w in enumerate(word_counts, start=1):
        wordtoix[w] = ix
        ixtoword[ix] = w

    def to_ids(caps):
        return [[wordtoix[w] for w in sent if w in wordtoix]
                for sent in caps]

    return (to_ids(train_captions), to_ids(test_captions),
            ixtoword, wordtoix, len(ixtoword))


class AttnGanDataset:
    max_objects = MAX_OBJECTS
    label_dim = 81

    def __init__(self, data_dir: str, img_dir: str, split: str = "train",
                 base_size: int = 64, branch_num: int = 3,
                 captions_per_image: int = 5, words_num: int = 12,
                 seed: int = 0):
        self.img_dir = img_dir
        self.split_dir = os.path.join(data_dir, split)
        self.words_num = words_num
        self.embeddings_num = captions_per_image
        self.imsizes = [base_size * (2 ** i) for i in range(branch_num)]
        self._rng = np.random.RandomState(seed)

        # load_pickle: the published pickles are Python-2 cPickle
        # (code/coco/attngan/datasets.py:261-291)
        self.bboxes = np.array(
            load_pickle(os.path.join(self.split_dir, "bboxes.pickle")),
            np.float32)
        self.labels = np.array(
            load_pickle(os.path.join(self.split_dir, "labels.pickle")))

        cache = os.path.join(data_dir, "captions.pickle")
        train_names = self._load_filenames(data_dir, "train")
        test_names = self._load_filenames(data_dir, "test")
        if not os.path.isfile(cache):
            tr = load_captions(data_dir, train_names, captions_per_image)
            te = load_captions(data_dir, test_names, captions_per_image)
            tr, te, self.ixtoword, self.wordtoix, self.n_words = \
                build_dictionary(tr, te)
            with open(cache, "wb") as f:
                pickle.dump([tr, te, self.ixtoword, self.wordtoix], f)
        else:
            # the published captions.pickle is py2 cPickle — vocab-index
            # parity with the published DAMSM NET_E depends on reading it
            tr, te, self.ixtoword, self.wordtoix = load_pickle(cache)
            self.n_words = len(self.ixtoword)
        self.captions = tr if split == "train" else te
        self.filenames = train_names if split == "train" else test_names

        cls_path = os.path.join(self.split_dir, "class_info.pickle")
        if os.path.isfile(cls_path):
            self.class_id = np.asarray(load_pickle(cls_path))
        else:
            self.class_id = np.arange(len(self.filenames))

    @staticmethod
    def _load_filenames(data_dir, split):
        path = os.path.join(data_dir, split, "filenames.pickle")
        if os.path.isfile(path):
            return load_pickle(path)
        return []

    def __len__(self):
        return len(self.filenames)

    def _get_caption(self, sent_ix):
        sent = np.asarray(self.captions[sent_ix], np.int64)
        x = np.zeros(self.words_num, np.int32)
        if len(sent) <= self.words_num:
            x[: len(sent)] = sent
            x_len = max(len(sent), 1)
        else:
            ix = np.sort(self._rng.permutation(len(sent))[: self.words_num])
            x[:] = sent[ix]
            x_len = self.words_num
        return x, x_len

    def _scale_bbox(self, bbox, h1: int, w1: int, flip: bool) -> np.ndarray:
        """bbox rescale under resize(268)->crop(256)->flip
        (datasets.py:95-137)."""
        bbox_scaled = np.full_like(bbox, -1.0)
        for i in range(MAX_OBJECTS):
            bt = bbox[i]
            if bt[0] == -1:
                break
            x = max(bt[0] * 268.0 - h1, 0) / 256.0
            y = max(bt[1] * 268.0 - w1, 0) / 256.0
            w = min((268.0 / 256.0) * bt[2], 1.0)
            if x + w > 0.999:
                w = 1.0 - x - 0.001
            h = min((268.0 / 256.0) * bt[3], 1.0)
            if y + h > 0.999:
                h = 1.0 - y - 0.001
            if flip:
                x = 1.0 - x - w
            bbox_scaled[i] = [x, y, w, h]
        return bbox_scaled.astype(np.float32)

    def __getitem__(self, index):
        key = str(self.filenames[index])
        img = Image.open(os.path.join(self.img_dir, key + ".jpg"))
        img = img.convert("RGB").resize((268, 268), Image.BILINEAR)
        # raw uint8 transport; all pyramid ops below stay uint8 like the
        # reference's PIL pipeline; normalize-on-device (as_model_image)
        arr = np.asarray(img)

        # 256 crop + flip with bbox rescale (datasets.py:95-137)
        flip = self._rng.rand() < 0.5
        h1 = int(np.floor(12 * self._rng.rand()))
        w1 = int(np.floor(12 * self._rng.rand()))
        crop = arr[w1:w1 + 256, h1:h1 + 256]
        if flip:
            crop = crop[:, ::-1].copy()
        bbox_scaled = self._scale_bbox(self.bboxes[index], h1, w1, flip)

        out = {}
        for s in self.imsizes:
            if s == 256:
                out[f"image{s}"] = crop
            else:
                im = Image.fromarray(crop).resize((s, s), Image.BILINEAR)
                out[f"image{s}"] = np.asarray(im)

        sent_ix = self._rng.randint(0, self.embeddings_num)
        caps, cap_len = self._get_caption(
            index * self.embeddings_num + sent_ix)
        out.update({
            "bbox": bbox_scaled,
            "label_onehot": labels_to_onehot(self.labels[index]),
            "captions": caps,
            "cap_lens": np.int32(cap_len),
            "class_ids": np.int32(self.class_id[index]),
        })
        return out

    def get_batch(self, idxs, threads: int = 16) -> dict:
        """Batched fast path: native threaded JPEG decode at 268px
        (native/loader.cpp thread pool) + vectorized crop/flip; the
        sub-256 pyramid uses the same PIL bilinear as __getitem__, so the
        two paths agree exactly given the same rng draw order."""
        from multiple_objects_gan_tpu.data.native_loader import decode_batch

        idxs = np.asarray(idxs)
        n = len(idxs)
        paths = [os.path.join(self.img_dir, str(self.filenames[i]) + ".jpg")
                 for i in idxs]
        arrs = decode_batch(paths, 268, 268, 3, threads=threads,
                            dtype=np.uint8)

        imgs256 = np.empty((n, 256, 256, 3), np.uint8)
        bbox_out = np.empty((n, MAX_OBJECTS, 4), np.float32)
        caps = np.empty((n, self.words_num), np.int32)
        lens = np.empty((n,), np.int32)
        for j, i in enumerate(idxs):
            flip = self._rng.rand() < 0.5
            h1 = int(np.floor(12 * self._rng.rand()))
            w1 = int(np.floor(12 * self._rng.rand()))
            crop = arrs[j, w1:w1 + 256, h1:h1 + 256]
            imgs256[j] = crop[:, ::-1] if flip else crop
            bbox_out[j] = self._scale_bbox(self.bboxes[i], h1, w1, flip)
            sent_ix = self._rng.randint(0, self.embeddings_num)
            caps[j], lens[j] = self._get_caption(
                int(i) * self.embeddings_num + sent_ix)

        out = {}
        for s in self.imsizes:
            if s == 256:
                out[f"image{s}"] = imgs256
            else:
                scaled = np.empty((n, s, s, 3), np.uint8)
                for j in range(n):
                    im = Image.fromarray(imgs256[j])
                    scaled[j] = np.asarray(im.resize((s, s),
                                                     Image.BILINEAR))
                out[f"image{s}"] = scaled
        out.update({
            "bbox": bbox_out,
            "label_onehot": np.stack(
                [labels_to_onehot(self.labels[i]) for i in idxs]),
            "captions": caps,
            "cap_lens": lens,
            "class_ids": self.class_id[idxs].astype(np.int32),
        })
        return out


def write_synthetic_attngan(data_dir: str, img_dir: str, n: int = 32,
                            seed: int = 0, captions_per_image: int = 5,
                            vocab: int = 50) -> None:
    """Tiny attngan-format dataset with CONTENT-DESCRIPTIVE captions.
    Objects are drawn as label-colored rectangles at their bbox locations
    on a dark background (same scheme as
    :func:`data.coco.write_synthetic_coco`), and each caption names every
    object (``obj<label>``) followed by its coarse 3x3-grid location
    (``loc<gx><gy>``), in a per-caption random order, plus 1-3 filler
    words. The text therefore genuinely describes the image: DAMSM
    pretraining (sent/word contrastive losses, losses/damsm.py) has a
    learnable image<->text correspondence, and the attngan trainer's
    LAMBDA-weighted word/sentence loss (ref
    code/coco/attngan/trainer.py:330-340) is exercisable at reference
    strength on synthetic data. Tokenizer note: captions survive the
    ``\\w+`` tokenize() intact (digits are word chars)."""
    rng = np.random.RandomState(seed)
    words = [f"word{i}" for i in range(vocab)]
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(data_dir, "text"), exist_ok=True)
    for split, count in [("train", n), ("test", max(4, n // 4))]:
        split_dir = os.path.join(data_dir, split)
        os.makedirs(split_dir, exist_ok=True)
        filenames, bboxes, labels = [], [], []
        for i in range(count):
            key = f"{split}_{i:05d}"
            img = (rng.rand(268, 268, 3) * 40).astype(np.uint8)
            filenames.append(key)
            n_obj = rng.randint(1, MAX_OBJECTS + 1)
            bb = np.full((MAX_OBJECTS, 4), -1.0, np.float32)
            lab = np.full((MAX_OBJECTS, 1), -1, np.int64)
            obj_tokens = []
            for j in range(n_obj):
                w, h = rng.uniform(0.2, 0.4, 2)
                bb[j] = [rng.uniform(0, 1 - w), rng.uniform(0, 1 - h), w, h]
                lab[j] = rng.randint(0, 80)
                x0, y0 = int(bb[j][0] * 268), int(bb[j][1] * 268)
                x1 = int((bb[j][0] + bb[j][2]) * 268)
                y1 = int((bb[j][1] + bb[j][3]) * 268)
                lab_j = int(lab[j, 0])
                color = np.array([120 + 135 * ((lab_j * k) % 9) // 8
                                  for k in (1, 2, 3)], np.uint8)
                img[y0:y1, x0:x1] = color
                gx = min(int((bb[j][0] + bb[j][2] / 2) * 3), 2)
                gy = min(int((bb[j][1] + bb[j][3] / 2) * 3), 2)
                obj_tokens.append(f"obj{lab_j} loc{gx}{gy}")
            cap_lines = []
            for _ in range(captions_per_image):
                order = rng.permutation(n_obj)
                toks = [obj_tokens[j] for j in order]
                toks += list(rng.choice(words, rng.randint(1, 4)))
                cap_lines.append(" ".join(toks))
            with open(os.path.join(data_dir, "text", key + ".txt"), "w") as f:
                f.write("\n".join(cap_lines))
            Image.fromarray(img).save(os.path.join(img_dir, key + ".jpg"))
            bboxes.append(bb)
            labels.append(lab)
        for name, obj in [("filenames.pickle", filenames),
                          ("bboxes.pickle", np.stack(bboxes)),
                          ("labels.pickle", np.stack(labels))]:
            with open(os.path.join(split_dir, name), "wb") as f:
                pickle.dump(obj, f)
