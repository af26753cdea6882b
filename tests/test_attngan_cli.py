"""End-to-end attngan CLI paths: train loop (consolidated on run_epochs),
B_VALIDATION sample() grids, gen_example attention maps, sampling FID/IS.

Reference dispatch: code/coco/attngan/main.py:153-160 (B_VALIDATION=True
runs sample(), else gen_example); sample() = trainer.py:474-579.
"""

import json
import os

import numpy as np
import pytest

from multiple_objects_gan_tpu.cli.main import main

_TRAIN_YML = """
CONFIG_NAME: 'attn2'
DATASET_NAME: 'coco'
DATA_DIR: '{data}'
IMG_DIR: '{imgs}'
GPU_ID: '0'
WORKERS: 1
TREE:
    BRANCH_NUM: 2
TRAIN:
    FLAG: True
    BATCH_SIZE: 8
    MAX_EPOCH: 1
    SNAPSHOT_INTERVAL: 1
    DISCRIMINATOR_LR: 0.0002
    GENERATOR_LR: 0.0002
    NET_E: ''
    B_NET_D: True
GAN:
    DF_DIM: 8
    GF_DIM: 8
    Z_DIM: 16
    R_NUM: 2
TEXT:
    EMBEDDING_DIM: 32
    CAPTIONS_PER_IMAGE: 5
    WORDS_NUM: 12
"""

# eval runs unsharded: batch 4 matches the 4-item synthetic test split
_EVAL_YML = _TRAIN_YML.replace("FLAG: True", "FLAG: False").replace(
    "BATCH_SIZE: 8", "BATCH_SIZE: 4").replace(
    "TRAIN:", "B_VALIDATION: True\nTRAIN:")


@pytest.fixture(scope="module")
def attn_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("attn_cli")
    data, imgs = str(root / "data"), str(root / "imgs")
    from multiple_objects_gan_tpu.data.attngan import write_synthetic_attngan
    write_synthetic_attngan(data, imgs, n=16, seed=3)
    train_yml = root / "train.yml"
    train_yml.write_text(_TRAIN_YML.format(data=data, imgs=imgs))
    eval_yml = root / "eval.yml"
    eval_yml.write_text(_EVAL_YML.format(data=data, imgs=imgs))
    return root, str(train_yml), str(eval_yml)


def test_attngan_train_epoch(attn_env):
    root, train_yml, _ = attn_env
    out = str(root / "out_train")
    main(["--variant", "coco-attngan", "--cfg", train_yml,
          "--output_dir", out, "--manualSeed", "7"])
    # consolidated loop artifacts: epoch grid + attention montages +
    # checkpoint + real samples + source snapshot
    imgs = os.listdir(os.path.join(out, "images"))
    assert "real_samples.png" in imgs
    assert "fake_samples_epoch_000.png" in imgs
    assert "attention_maps_epoch_000.png" in imgs
    assert "attention_maps_step_0000000.png" in imgs
    assert os.path.isdir(os.path.join(out, "models", "0"))
    assert os.path.isdir(os.path.join(out, "src_snapshot", "models"))


def test_attngan_resume_continues_training(attn_env):
    """--resume restores the full state (params + per-D optimizers + EMA)
    and continues from the next epoch (ref trainer.py:99-107,150-158)."""
    root, train_yml, _ = attn_env
    prev = str(root / "out_train")
    if not os.path.isdir(os.path.join(prev, "models", "0")):
        main(["--variant", "coco-attngan", "--cfg", train_yml,
              "--output_dir", prev, "--manualSeed", "7"])
    out = str(root / "out_resumed")
    main(["--variant", "coco-attngan", "--cfg", train_yml,
          "--output_dir", out, "--manualSeed", "7",
          "--resume", prev, "--max_epochs", "2"])
    # epoch 0 came from the checkpoint; only epoch 1 ran and snapshotted
    assert os.path.isdir(os.path.join(out, "models", "1"))
    assert not os.path.isdir(os.path.join(out, "models", "0"))


def test_attngan_sample_dispatch(attn_env):
    """B_VALIDATION=True -> sample(): 10-tile grids named by caption."""
    root, _, eval_yml = attn_env
    out = str(root / "out_sample")
    main(["--variant", "coco-attngan", "--cfg", eval_yml,
          "--output_dir", out, "--manualSeed", "7"])
    files = os.listdir(os.path.join(out, "samples"))
    assert len(files) == 4  # synthetic test split has max(4, 12//4) items
    assert all(f.endswith(".png") for f in files)


def test_attngan_gen_example(attn_env):
    root, _, eval_yml = attn_env
    out = str(root / "out_gen")
    main(["--variant", "coco-attngan", "--cfg", eval_yml,
          "--output_dir", out, "--manualSeed", "7",
          "--eval_mode", "gen_example"])
    files = os.listdir(os.path.join(out, "gen_example"))
    # per-scale images + per-word attention montage per caption
    assert "0_s_0_g0.png" in files
    assert "0_s_0_g1.png" in files
    assert "0_s_0_a0.png" in files


def test_load_example_captions(tmp_path):
    """Caption-source resolution mirrors the reference driver
    (main.py:39-60): example_filenames.txt lists per-key caption files;
    fallback is example_captions.txt, then built-ins."""
    from multiple_objects_gan_tpu.cli.attngan_runner import (
        load_example_captions)

    d = str(tmp_path)
    # no files at all -> built-in captions under the 'gen_example' key
    assert list(load_example_captions(d)) == ["gen_example"]

    (tmp_path / "example_captions.txt").write_text("a red cat\n\nblue dog\n")
    assert load_example_captions(d) == {
        "example_captions": ["a red cat", "blue dog"]}

    # the index file takes precedence; keys are file stems; missing
    # entries are skipped
    (tmp_path / "text").mkdir()
    (tmp_path / "text" / "birds.txt").write_text("a bird\nanother bird\n")
    (tmp_path / "example_filenames.txt").write_text(
        "text/birds\ntext/missing\n")
    assert load_example_captions(d) == {
        "birds": ["a bird", "another bird"]}


def test_attngan_sampling_metrics(attn_env):
    root, _, eval_yml = attn_env
    out = str(root / "out_dump")
    main(["--variant", "coco-attngan", "--cfg", eval_yml,
          "--output_dir", out, "--manualSeed", "7",
          "--eval_mode", "sampling"])
    singles = os.listdir(os.path.join(out, "single_samples"))
    assert len(singles) == 4  # one full batch over the 4-item test split
    with open(os.path.join(out, "eval_metrics.json")) as f:
        m = json.load(f)
    assert set(m) >= {"fid", "inception_score_mean", "inception_score_std"}
    assert m["fid"] >= 0.0 and m["inception_score_mean"] >= 1.0
    # machine-readable provenance: the test env has no NET_E .pth and no
    # $INCEPTION_V3_WEIGHTS, so both must say "random" (a real run with
    # imported DAMSM weights + torchvision head says "imported")
    assert m["is_head"] == "random"
    assert m["fid_encoder"] == "random"


def test_attngan_sampling_canonical_fid(attn_env, tmp_path, monkeypatch):
    """$FID_INCEPTION_WEIGHTS routes sampling()'s FID through the
    canonical pytorch-fid encoder: eval_metrics.json must record
    fid_encoder == "fid_canonical" and still produce finite metrics
    (IS stays on the DAMSM-compatible backbone)."""
    import torch

    from test_fid_inception import (
        FIDInceptionTorch, _randomize, _save_sd_with_head_keys)

    root, _, eval_yml = attn_env
    pth = tmp_path / "pt_inception_rand.pth"
    torch.manual_seed(0)
    _save_sd_with_head_keys(_randomize(FIDInceptionTorch(), seed=11).eval(),
                            str(pth))
    monkeypatch.setenv("FID_INCEPTION_WEIGHTS", str(pth))
    out = str(root / "out_dump_canonical")
    main(["--variant", "coco-attngan", "--cfg", eval_yml,
          "--output_dir", out, "--manualSeed", "7",
          "--eval_mode", "sampling"])
    with open(os.path.join(out, "eval_metrics.json")) as f:
        m = json.load(f)
    assert m["fid_encoder"] == "fid_canonical"
    assert np.isfinite(m["fid"]) and m["fid"] >= 0.0
    assert m["inception_score_mean"] >= 1.0
