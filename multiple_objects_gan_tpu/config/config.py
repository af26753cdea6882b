"""YAML config system — same key schema as the reference's cfg/*.yml.

Parity targets: the per-variant edict default trees + strict recursive merge
in code/<variant>/miscc/config.py (mnist :9-47, clevr :9-45, stackgan :9-57,
attngan :9-64) and cfg_from_file (:83-89). A YAML key must already exist in
the defaults and its type must match, exactly like ``_merge_a_into_b``.

Existing reference YAML files load unchanged.
"""

from __future__ import annotations

import copy
from typing import Any

import yaml


class Config(dict):
    """Minimal attribute-access dict (edict replacement)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(d: dict) -> "Config":
        return Config({k: Config.wrap(v) if isinstance(v, dict) else v
                       for k, v in d.items()})


_COMMON_TRAIN = {
    "FLAG": True,
    "BATCH_SIZE": 64,
    "MAX_EPOCH": 600,
    "SNAPSHOT_INTERVAL": 50,
    "PRETRAINED_MODEL": "",
    "PRETRAINED_EPOCH": 600,
    "LR_DECAY_EPOCH": 600,
    "DISCRIMINATOR_LR": 2e-4,
    "GENERATOR_LR": 2e-4,
}

DEFAULTS: dict[str, dict] = {
    # code/multi-mnist/miscc/config.py:9-47
    "multi-mnist": {
        "DATASET_NAME": "multi-mnist",
        "CONFIG_NAME": "",
        "GPU_ID": "0",
        "CUDA": True,
        "WORKERS": 4,
        "NET_G": "",
        "NET_D": "",
        "DATA_DIR": "",
        "VIS_COUNT": 64,
        "Z_DIM": 100,
        "IMSIZE": 64,
        "USE_LOCAL_PATHWAY": True,
        "USE_BBOX_LAYOUT": True,
        "TRAIN": dict(_COMMON_TRAIN),
        "GAN": {"CONDITION_DIM": 128, "DF_DIM": 64, "GF_DIM": 128,
                "R_NUM": 4},
    },
    # code/clevr/miscc/config.py:9-45 (adds USE_BBOX_LAYOUT_S1, used by
    # model.py:126 but absent from the reference defaults — a latent bug we
    # fix by defaulting it False)
    "clevr": {
        "DATASET_NAME": "clevr",
        "CONFIG_NAME": "",
        "GPU_ID": "0",
        "CUDA": True,
        "WORKERS": 4,
        "NET_G": "",
        "NET_D": "",
        "DATA_DIR": "",
        "VIS_COUNT": 64,
        "Z_DIM": 100,
        "IMSIZE": 64,
        "USE_LOCAL_PATHWAY": True,
        "USE_BBOX_LAYOUT": True,
        "USE_BBOX_LAYOUT_S1": False,
        "TRAIN": dict(_COMMON_TRAIN),
        "GAN": {"CONDITION_DIM": 128, "DF_DIM": 64, "GF_DIM": 128,
                "R_NUM": 4},
    },
    # code/coco/stackgan/miscc/config.py:9-57
    "coco-stackgan": {
        "DATASET_NAME": "coco",
        "EMBEDDING_TYPE": "cnn-rnn",
        "CONFIG_NAME": "",
        "GPU_ID": "0",
        "CUDA": True,
        "WORKERS": 6,
        "NET_G": "",
        "NET_D": "",
        "STAGE1_G": "",
        "DATA_DIR": "",
        "IMG_DIR": "",
        "VIS_COUNT": 64,
        "Z_DIM": 100,
        "IMSIZE": 64,
        "STAGE": 1,
        "USE_LOCAL_PATHWAY": True,
        "USE_BBOX_LAYOUT": True,
        "TRAIN": {**_COMMON_TRAIN, "COEFF": {"KL": 2.0}},
        "GAN": {"CONDITION_DIM": 128, "DF_DIM": 64, "GF_DIM": 128,
                "R_NUM": 4},
        "TEXT": {"DIMENSION": 1024},
    },
    # code/coco/attngan/miscc/config.py:9-64
    "coco-attngan": {
        "DATASET_NAME": "coco",
        "CONFIG_NAME": "",
        "DATA_DIR": "",
        "IMG_DIR": "",
        "GPU_ID": "0",
        "CUDA": True,
        "WORKERS": 6,
        "RNN_TYPE": "LSTM",
        "B_VALIDATION": False,
        "TREE": {"BRANCH_NUM": 3, "BASE_SIZE": 64},
        "TRAIN": {
            "BATCH_SIZE": 64,
            "MAX_EPOCH": 600,
            "SNAPSHOT_INTERVAL": 2000,
            "DISCRIMINATOR_LR": 2e-4,
            "GENERATOR_LR": 2e-4,
            "ENCODER_LR": 2e-4,
            "RNN_GRAD_CLIP": 0.25,
            "FLAG": True,
            "NET_E": "",
            "NET_G": "",
            "B_NET_D": True,
            "SMOOTH": {"GAMMA1": 5.0, "GAMMA3": 10.0, "GAMMA2": 5.0,
                       "LAMBDA": 1.0},
        },
        "GAN": {"DF_DIM": 64, "GF_DIM": 128, "Z_DIM": 100,
                "CONDITION_DIM": 100, "R_NUM": 2, "B_ATTENTION": True,
                "B_DCGAN": False},
        "TEXT": {"CAPTIONS_PER_IMAGE": 10, "EMBEDDING_DIM": 256,
                 "WORDS_NUM": 18},
    },
}


def _merge(a: dict, b: dict, path: str = "") -> None:
    """Strict recursive merge of a into b (parity: _merge_a_into_b)."""
    for k, v in a.items():
        if k not in b:
            raise KeyError(f"{path}{k} is not a valid config key")
        old = b[k]
        if isinstance(old, dict):
            if not isinstance(v, dict):
                raise ValueError(f"Type mismatch for config key {path}{k}")
            _merge(v, old, path=f"{path}{k}.")
        else:
            if old is not None and v is not None:
                ot, nt = type(old), type(v)
                if ot is not nt and not (ot in (int, float) and nt in (int, float)):
                    raise ValueError(
                        f"Type mismatch ({ot} vs {nt}) for config key {path}{k}")
            b[k] = v


def default_config(variant: str) -> Config:
    if variant not in DEFAULTS:
        raise KeyError(f"unknown variant {variant!r}; "
                       f"one of {sorted(DEFAULTS)}")
    return Config.wrap(copy.deepcopy(DEFAULTS[variant]))


def cfg_from_file(path: str, variant: str) -> Config:
    """Load a YAML file and merge it over the variant defaults."""
    cfg = default_config(variant)
    with open(path) as f:
        overrides = yaml.safe_load(f) or {}
    _merge(overrides, cfg)
    return cfg


def stage1_model_config(cfg: Config, variant: str):
    """Bridge a YAML Config to the model-family Stage1Config."""
    from multiple_objects_gan_tpu.models import common

    base = {
        "multi-mnist": common.MNIST,
        "clevr": common.CLEVR,
        "coco-stackgan": common.COCO_S1,
    }[variant]
    import dataclasses
    kw: dict[str, Any] = dict(
        z_dim=cfg.Z_DIM, gf_dim=cfg.GAN.GF_DIM, df_dim=cfg.GAN.DF_DIM,
        # the clevr reference also honors USE_BBOX_LAYOUT_S1
        # (code/clevr/model.py:126, `USE_BBOX_LAYOUT or USE_BBOX_LAYOUT_S1`)
        use_bbox_layout=bool(cfg.USE_BBOX_LAYOUT
                             or cfg.get("USE_BBOX_LAYOUT_S1", False)))
    if variant != "multi-mnist":
        kw["condition_dim"] = cfg.GAN.CONDITION_DIM
    if variant == "coco-stackgan":
        kw["text_dim"] = cfg.TEXT.DIMENSION
        kw["d_cond_dim"] = cfg.GAN.CONDITION_DIM
    return dataclasses.replace(base, **kw)
