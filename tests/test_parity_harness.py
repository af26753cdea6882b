"""End-to-end smoke test of the one-command FID/IS parity harness:
NET_G .pth + data dir -> importer -> sampling() dump -> FID/IS JSON
(tools/parity_harness.py; reference semantics
code/coco/attngan/trainer.py:387-472). On real hardware the same command
with the published checkpoints is the FID-parity demonstration."""

import json
import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parity_harness  # noqa: E402

_EVAL_YML = """
CONFIG_NAME: 'attn2'
DATASET_NAME: 'coco'
DATA_DIR: '{data}'
IMG_DIR: '{imgs}'
GPU_ID: '0'
WORKERS: 1
B_VALIDATION: True
TREE:
    BRANCH_NUM: 2
TRAIN:
    FLAG: False
    BATCH_SIZE: 4
    NET_E: ''
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


@pytest.fixture(scope="module")
def harness_env(tmp_path_factory):
    """Synthetic stand-ins: data dir + a reference-format netG .pth
    exported from a randomly-initialized tiny GNet (exact exporter
    inverse of the importer the harness exercises)."""
    root = tmp_path_factory.mktemp("parity")
    data, imgs = str(root / "data"), str(root / "imgs")
    from multiple_objects_gan_tpu.data.attngan import write_synthetic_attngan
    write_synthetic_attngan(data, imgs, n=8, seed=11)

    base_yml = root / "eval.yml"
    base_yml.write_text(_EVAL_YML.format(data=data, imgs=imgs))

    from multiple_objects_gan_tpu.config.config import cfg_from_file
    cfg = cfg_from_file(str(base_yml), "coco-attngan")
    from multiple_objects_gan_tpu.cli.attngan_runner import build_all
    from multiple_objects_gan_tpu.data.attngan import AttnGanDataset
    ds = AttnGanDataset(data, imgs, split="test",
                        base_size=int(cfg.TREE.BASE_SIZE),
                        branch_num=2, captions_per_image=5,
                        words_num=12, seed=11)
    mcfg, g, d_modules, _, _ = build_all(cfg, ds.n_words)
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state)
    state = create_attngan_state(mcfg, g, d_modules, jax.random.PRNGKey(5),
                                 batch_size=2, seq_len=12)
    from multiple_objects_gan_tpu.io.torch_export import (
        export_attngan_g, save_bare_state_dict)
    sd = export_attngan_g(jax.device_get(state.g_params),
                          jax.device_get(state.g_stats),
                          branch_num=2, r_num=2)
    net_g = str(root / "netG_epoch_100.pth")
    save_bare_state_dict(sd, net_g)
    return root, str(base_yml), net_g, data, imgs


def test_parity_harness_one_shot(harness_env, capsys):
    root, base_yml, net_g, data, imgs = harness_env
    out = str(root / "parity_out")
    result = parity_harness.main([
        "--net_g", net_g, "--data_dir", data, "--img_dir", imgs,
        "--cfg", base_yml, "--out", out, "--num_images", "4",
        "--seed", "3"])

    # one JSON line on stdout == the returned dict
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last) == result

    assert result["fid"] >= 0.0
    assert result["inception_score_mean"] >= 1.0
    assert result["n_images"] == 4
    assert result["net_g"] == net_g
    # synthetic env has no DAMSM/torchvision weights -> provenance says so
    assert result["is_head"] == "random"
    assert result["is_backbone"] == "random"
    assert result["fid_encoder"] == "random"
    assert result["comparable_to_published"] is False
    # the reference-composition dump actually exists
    singles = os.listdir(result["samples_dir"])
    assert len(singles) == 4
    assert os.path.isfile(result["metrics_json"])
    # the merged cfg snapshot records what ran
    assert os.path.isfile(os.path.join(out, "parity_eval.yml"))
