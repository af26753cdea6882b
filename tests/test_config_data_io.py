"""Config system, dataset adapters, and checkpoint roundtrip tests."""

import glob
import os

import numpy as np
import pytest

from multiple_objects_gan_tpu.config.config import (
    cfg_from_file,
    default_config,
    stage1_model_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_exist_for_all_variants():
    for v in ["multi-mnist", "clevr", "coco-stackgan", "coco-attngan"]:
        cfg = default_config(v)
        assert cfg.TRAIN.BATCH_SIZE > 0


def test_all_shipped_yamls_load():
    ymls = sorted(glob.glob(os.path.join(REPO, "cfg", "*.yml")))
    assert len(ymls) == 11
    for y in ymls:
        name = os.path.basename(y)
        variant = ("multi-mnist" if name.startswith("mnist") else
                   "clevr" if name.startswith("clevr") else
                   # damsm pretraining shares the attngan schema
                   "coco-attngan" if ("attn" in name or "damsm" in name)
                   else "coco-stackgan")
        cfg = cfg_from_file(y, variant)
        assert cfg.DATASET_NAME


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("NOT_A_KEY: 1\n")
    with pytest.raises(KeyError):
        cfg_from_file(str(p), "multi-mnist")


def test_type_mismatch_rejected(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("Z_DIM: 'one hundred'\n")
    with pytest.raises(ValueError):
        cfg_from_file(str(p), "multi-mnist")


def test_stage1_bridge_uses_yaml_dims():
    cfg = cfg_from_file(os.path.join(REPO, "cfg", "clevr_train.yml"), "clevr")
    m = stage1_model_config(cfg, "clevr")
    assert m.gf_dim == 96 and m.df_dim == 48 and m.condition_dim == 16


def test_multimnist_roundtrip(tmp_path):
    from multiple_objects_gan_tpu.data.datasets import (
        Loader, MultiMnistDataset, write_synthetic_multimnist)
    write_synthetic_multimnist(str(tmp_path), n=16, split="train")
    ds = MultiMnistDataset(str(tmp_path), split="train")
    assert len(ds) == 16
    item = ds[0]
    assert item["image"].shape == (64, 64, 1)
    # raw uint8 transport; [-1, 1] normalization happens on-device
    assert item["image"].dtype == np.uint8
    from multiple_objects_gan_tpu.utils.images import as_model_image
    norm = as_model_image(item["image"])
    assert norm.dtype == np.float32
    assert norm.min() >= -1.0 and norm.max() <= 1.0
    assert item["bbox"].shape == (3, 4)
    assert item["label_onehot"].shape == (3, 10)
    loader = Loader(ds, 4)
    batches = list(loader.epoch(0))
    assert len(batches) == 4
    assert batches[0]["image"].shape == (4, 64, 64, 1)


def test_coco_dataset_stage2_dual_bboxes(tmp_path):
    from multiple_objects_gan_tpu.data.coco import (
        CocoStackganDataset, write_synthetic_coco)
    data_dir = str(tmp_path / "coco")
    img_dir = str(tmp_path / "imgs")
    write_synthetic_coco(data_dir, img_dir, n=8)
    ds = CocoStackganDataset(data_dir, img_dir, split="train", stage=2,
                             imsize=256)
    item = ds[0]
    assert item["image"].shape == (256, 256, 3)
    assert item["bbox"].shape == (3, 4) and item["bbox_s2"].shape == (3, 4)
    assert item["text_embedding"].shape == (1024,)
    # valid bboxes stay in [0, 1]; padding stays -1
    for key in ("bbox", "bbox_s2"):
        bb = item[key]
        valid = bb[:, 0] >= 0
        assert np.all(bb[valid] >= 0.0) and np.all(bb[valid] <= 1.0)
        assert np.all(bb[~valid] == -1.0)
    assert item["label_onehot"].shape == (3, 81)
    assert np.all(item["label_onehot"].sum(-1) == 1.0)


def test_attngan_dataset_vocab_and_captions(tmp_path):
    from multiple_objects_gan_tpu.data.attngan import (
        AttnGanDataset, write_synthetic_attngan)
    data_dir = str(tmp_path / "attn")
    img_dir = str(tmp_path / "imgs")
    write_synthetic_attngan(data_dir, img_dir, n=8)
    ds = AttnGanDataset(data_dir, img_dir, split="train", branch_num=3,
                        words_num=12)
    assert ds.n_words > 1
    item = ds[0]
    assert item["image64"].shape == (64, 64, 3)
    assert item["image128"].shape == (128, 128, 3)
    assert item["image256"].shape == (256, 256, 3)
    assert item["captions"].shape == (12,)
    assert 1 <= item["cap_lens"] <= 12
    # padding is 0 = <end>
    assert np.all(item["captions"][item["cap_lens"]:] == 0)
    # cache reload path
    ds2 = AttnGanDataset(data_dir, img_dir, split="test", branch_num=3)
    assert ds2.n_words == ds.n_words


def test_attngan_get_batch_matches_per_item(tmp_path):
    """The native-decode batched fast path must agree with __getitem__
    exactly (same rng draw order, same PIL bilinear pyramid)."""
    from multiple_objects_gan_tpu.data.attngan import (
        AttnGanDataset, write_synthetic_attngan)
    data_dir = str(tmp_path / "attn")
    img_dir = str(tmp_path / "imgs")
    write_synthetic_attngan(data_dir, img_dir, n=8)
    ds_a = AttnGanDataset(data_dir, img_dir, split="train", branch_num=3,
                          seed=9)
    ds_b = AttnGanDataset(data_dir, img_dir, split="train", branch_num=3,
                          seed=9)
    batch = ds_a.get_batch(list(range(6)))
    items = [ds_b[i] for i in range(6)]
    ref = {k: np.stack([it[k] for it in items]) for k in items[0]}
    assert set(batch) == set(ref)
    for k in ref:
        a, b = batch[k], ref[k]
        if a.dtype == np.uint8:  # uint8 image transport: compare in f32
            assert b.dtype == np.uint8, k
            np.testing.assert_allclose(a.astype(np.float32),
                                       b.astype(np.float32), atol=2.6,
                                       err_msg=k)
        else:
            np.testing.assert_allclose(a, b, atol=2e-2, err_msg=k)
    np.testing.assert_array_equal(batch["captions"], ref["captions"])
    np.testing.assert_allclose(batch["bbox"], ref["bbox"], atol=1e-6)


def test_coco_get_batch_matches_per_item(tmp_path):
    from multiple_objects_gan_tpu.data.coco import (
        CocoStackganDataset, write_synthetic_coco)
    data_dir = str(tmp_path / "coco")
    img_dir = str(tmp_path / "imgs")
    write_synthetic_coco(data_dir, img_dir, n=8)
    ds_a = CocoStackganDataset(data_dir, img_dir, split="train", stage=2,
                               imsize=256, seed=9)
    ds_b = CocoStackganDataset(data_dir, img_dir, split="train", stage=2,
                               imsize=256, seed=9)
    batch = ds_a.get_batch(list(range(6)))
    items = [ds_b[i] for i in range(6)]
    ref = {k: np.stack([it[k] for it in items]) for k in items[0]}
    assert set(batch) == set(ref)
    np.testing.assert_allclose(batch["bbox"], ref["bbox"], atol=1e-6)
    np.testing.assert_allclose(batch["bbox_s2"], ref["bbox_s2"], atol=1e-6)
    np.testing.assert_allclose(batch["text_embedding"],
                               ref["text_embedding"], atol=1e-6)
    # decode backends differ only in bilinear filter tails (uint8 units)
    assert batch["image"].dtype == np.uint8 == ref["image"].dtype
    np.testing.assert_allclose(batch["image"].astype(np.float32),
                               ref["image"].astype(np.float32), atol=8.0)


def test_checkpoint_roundtrip(tmp_path):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.models import common
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import create_state

    cfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=4)
    state = create_state(cfg, Stage1G(cfg), Stage1D(cfg),
                         jax.random.PRNGKey(0))
    state = state.replace(step=jnp.int32(7))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(0, state, wait=True)
    mgr.save(1, state.replace(step=jnp.int32(9)), wait=True)
    restored, epoch = mgr.restore(state)
    assert epoch == 1 and int(restored.step) == 9
    leaves0 = jax.tree.leaves(state.g_params)
    leaves1 = jax.tree.leaves(restored.g_params)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.save(2, state, wait=True)
    mgr.close()
    # rotation keeps only 2
    kept = [d for d in os.listdir(tmp_path / "ckpt") if d.isdigit()]
    assert len(kept) == 2


def test_clevr_dataset_pad_label_slots(tmp_path):
    """Absent objects one-hot the LAST slot of each label group (shape 3,
    color 8 -> combined index 12), exactly like the reference's
    label_one_hot (code/clevr/miscc/datasets.py:100-107,
    labels[labels < 0] = dim-1); real objects leave those slots at 0."""
    from multiple_objects_gan_tpu.data.datasets import (
        ClevrDataset, write_synthetic_clevr)

    write_synthetic_clevr(str(tmp_path), n=8, split="train", seed=0)
    ds = ClevrDataset(str(tmp_path), split="train", hflip=False)
    found_pad = False
    for i in range(len(ds)):
        item = ds[i]
        lab, bb = item["label_onehot"], item["bbox"]
        for j in range(4):
            assert lab[j].sum() == 2.0  # one shape slot + one color slot
            if bb[j, 0] < 0:
                found_pad = True
                assert lab[j, 3] == 1.0 and lab[j, 4 + 8] == 1.0
            else:
                assert lab[j, 3] == 0.0 and lab[j, 4 + 8] == 0.0
    assert found_pad  # the synthetic writer emits 2-4 objects per scene
