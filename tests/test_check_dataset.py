"""tools/check_dataset.py: first-contact diagnostics (VERDICT r3 next #7).

Drives the checker over every synthetic writer (healthy -> ok), py2-format
pickles (ok + encoding reported), and corrupted fixtures (ok=false with a
diagnosis, never a traceback).
"""

import json
import os
import pickle

import numpy as np
import pytest

from test_pycompat import write_py2_pickle
from tools.check_dataset import main as check_main


def _run(capsys, *argv) -> dict:
    rc = check_main(list(argv))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (rc == 0) == out["ok"]
    return out


@pytest.fixture(scope="module")
def mnist_dir(tmp_path_factory):
    from multiple_objects_gan_tpu.data.datasets import (
        write_synthetic_multimnist)

    d = tmp_path_factory.mktemp("mnist_ck")
    write_synthetic_multimnist(str(d), n=8, split="train", seed=0)
    return str(d)


def test_mnist_healthy(mnist_dir, capsys):
    out = _run(capsys, "mnist", mnist_dir)
    assert out["ok"], out["errors"]
    assert out["report"]["n_items"] == 8
    assert out["report"]["labels"]["shape"] == [8, 3, 10]
    assert out["report"]["images_sampled"] >= 1


def test_mnist_wrong_channel_count_warns(mnist_dir, tmp_path, capsys):
    """RGB files in a grayscale-variant dir (or vice versa) are survivable
    (loaders .convert()) but usually mean a wrong directory — the checker
    must flag it as a warning while staying ok."""
    import shutil

    from PIL import Image

    d = tmp_path / "m"
    shutil.copytree(mnist_dir, d)
    img_dir = d / "train" / "normal" / "imgs"
    name = sorted(os.listdir(img_dir))[0]
    Image.new("RGB", (64, 64), (10, 20, 30)).save(img_dir / name)
    out = _run(capsys, "mnist", str(d))
    assert out["ok"], out["errors"]
    assert any("channels" in w for w in out["warnings"]), out["warnings"]
    assert "RGB" in str(out["report"]["image_modes_sampled"])


def test_mnist_py2_pickles_reported(mnist_dir, tmp_path, capsys):
    import shutil

    d = tmp_path / "m"
    shutil.copytree(mnist_dir, d)
    sd = d / "train" / "normal"
    from multiple_objects_gan_tpu.io.pycompat import load_pickle

    bb = np.asarray(load_pickle(str(sd / "bboxes.pickle")), np.float32)
    write_py2_pickle(str(sd / "bboxes.pickle"), bb)
    out = _run(capsys, "mnist", str(d))
    assert out["ok"], out["errors"]
    # the diag must say the bboxes pickle needed a py2 decode stage
    assert out["report"]["bboxes_pickle_encoding"] in ("utf-8", "latin1")
    assert out["report"]["filenames_pickle_encoding"] == "py3"


def test_mnist_corrupted_pickle_is_diagnosed(mnist_dir, tmp_path, capsys):
    import shutil

    d = tmp_path / "m"
    shutil.copytree(mnist_dir, d)
    with open(d / "train" / "normal" / "labels.pickle", "wb") as f:
        f.write(b"\x80\x02not a pickle at all")
    out = _run(capsys, "mnist", str(d))
    assert not out["ok"]
    assert any("labels" in e and "undecodable" in e for e in out["errors"])


def test_mnist_missing_file_and_bad_range(mnist_dir, tmp_path, capsys):
    import shutil

    d = tmp_path / "m"
    shutil.copytree(mnist_dir, d)
    sd = d / "train" / "normal"
    os.remove(sd / "filenames.pickle")
    # un-normalized (pixel) bboxes must be flagged
    with open(sd / "bboxes.pickle", "wb") as f:
        pickle.dump(np.full((8, 3, 4), 17.0, np.float32), f)
    out = _run(capsys, "mnist", str(d))
    assert not out["ok"]
    assert any("missing file" in e for e in out["errors"])
    assert any("outside [0, 1]" in e for e in out["errors"])


def test_clevr_healthy_and_corrupt(tmp_path, capsys):
    from multiple_objects_gan_tpu.data.datasets import write_synthetic_clevr

    d = tmp_path / "clevr"
    write_synthetic_clevr(str(d), n=6, split="train", seed=0)
    out = _run(capsys, "clevr", str(d))
    assert out["ok"], out["errors"]
    assert out["report"]["n_items"] == 6

    # corrupt one scene json
    scene_dir = d / "train" / "scenes"
    victim = sorted(os.listdir(scene_dir))[0]
    with open(scene_dir / victim, "w") as f:
        f.write("{broken json")
    out = _run(capsys, "clevr", str(d))
    assert not out["ok"]
    assert any("unparsable" in e for e in out["errors"])


def test_coco_healthy_and_embedding_shape(tmp_path, capsys):
    from multiple_objects_gan_tpu.data.coco import write_synthetic_coco

    data, imgs = str(tmp_path / "d"), str(tmp_path / "imgs")
    write_synthetic_coco(data, imgs, n=6, split="train", seed=0)
    out = _run(capsys, "coco-stackgan", data, "--img_dir", imgs)
    assert out["ok"], out["errors"]
    assert out["report"]["embeddings"]["shape"][-1] == 1024

    # wrong embedding width -> diagnosed
    with open(os.path.join(data, "train",
                           "char-CNN-RNN-embeddings.pickle"), "wb") as f:
        pickle.dump(np.zeros((6, 5, 77), np.float32), f)
    out = _run(capsys, "coco-stackgan", data, "--img_dir", imgs)
    assert not out["ok"]
    assert any("1024" in e for e in out["errors"])


def test_attngan_healthy_and_vocab(tmp_path, capsys):
    from multiple_objects_gan_tpu.data.attngan import (
        AttnGanDataset, write_synthetic_attngan)

    data, imgs = str(tmp_path / "d"), str(tmp_path / "imgs")
    write_synthetic_attngan(data, imgs, n=6, seed=0)
    # no captions.pickle yet: ok (text/ dir present)
    out = _run(capsys, "coco-attngan", data, "--img_dir", imgs)
    assert out["ok"], out["errors"]

    # build the cache, then re-check: vocab reported
    AttnGanDataset(data, imgs, split="train", branch_num=2, base_size=64)
    out = _run(capsys, "coco-attngan", data, "--img_dir", imgs)
    assert out["ok"], out["errors"]
    assert out["report"]["vocab_size"] > 0

    # corrupt the vocab maps -> diagnosed
    from multiple_objects_gan_tpu.io.pycompat import load_pickle

    cache = os.path.join(data, "captions.pickle")
    tr, te, ixtoword, wordtoix = load_pickle(cache)
    wordtoix = {w: ix + 1 for w, ix in wordtoix.items()}  # break inverse
    with open(cache, "wb") as f:
        pickle.dump([tr, te, ixtoword, wordtoix], f)
    out = _run(capsys, "coco-attngan", data, "--img_dir", imgs)
    assert not out["ok"]
    assert any("not inverse" in e for e in out["errors"])


def test_missing_dataset_dir_is_diagnosed(tmp_path, capsys):
    out = _run(capsys, "mnist", str(tmp_path / "nope"))
    assert not out["ok"]
    assert out["errors"]
