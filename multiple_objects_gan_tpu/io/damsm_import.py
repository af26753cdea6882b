"""DAMSM encoder checkpoint importer (text_encoder*.pth / image_encoder*.pth).

Maps the published AttnGAN DAMSM weights (code/coco/attngan/model.py:120-313)
onto the Flax RNNEncoder / CNNEncoder trees:
  * torch nn.LSTM l0 (+ _reverse) -> rnn_fwd / rnn_bwd with identical gate
    layout (both are [i, f, g, o] with separate ih/hh biases);
  * torchvision Inception submodules <name>.conv.weight (OIHW) and
    <name>.bn.{weight,bias,running_mean,running_var};
  * emb_features (1x1 conv) -> Dense kernel (768, nef); emb_cnn_code Linear.
"""

from __future__ import annotations

import numpy as np


def _np(v):
    return v.numpy() if hasattr(v, "numpy") else np.asarray(v)


def _load_sd(path: str) -> dict:
    from multiple_objects_gan_tpu.io.pycompat import torch_load

    # torch_load: published DAMSM .pth files were written by py2 torch-0.4
    sd = torch_load(path)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: _np(v) for k, v in sd.items()}


def import_text_encoder(path: str, variables: dict) -> dict:
    sd = _load_sd(path)
    params = dict(variables["params"])
    params["encoder"] = sd["encoder.weight"].astype(np.float32)
    for src, dst in [("", "rnn_fwd"), ("_reverse", "rnn_bwd")]:
        params[dst] = {
            "w_ih": sd[f"rnn.weight_ih_l0{src}"].astype(np.float32),
            "w_hh": sd[f"rnn.weight_hh_l0{src}"].astype(np.float32),
            "b_ih": sd[f"rnn.bias_ih_l0{src}"].astype(np.float32),
            "b_hh": sd[f"rnn.bias_hh_l0{src}"].astype(np.float32),
        }
    return {**variables, "params": params}


def _set(tree: dict, path: list[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_image_encoder(path: str, variables: dict,
                         skip_prefixes: tuple = ()) -> dict:
    """skip_prefixes: drop state-dict keys by prefix — pass
    ("AuxLogits.", "fc.") to load a full torchvision inception_v3
    state_dict (ImageNet backbone warm-start for DAMSM pretraining);
    the DAMSM-format .pth has neither module."""
    import copy

    sd = _load_sd(path)
    params = copy.deepcopy(dict(variables["params"]))
    stats = copy.deepcopy(dict(variables.get("batch_stats", {})))

    for key, val in sd.items():
        if any(key.startswith(p) for p in skip_prefixes):
            continue
        parts = key.split(".")
        val = np.asarray(val, np.float32)
        if key == "emb_cnn_code.weight":
            _set(params, ["emb_cnn_code", "kernel"], val.T)
        elif key == "emb_cnn_code.bias":
            _set(params, ["emb_cnn_code", "bias"], val)
        elif key == "emb_features.weight":      # (nef, 768, 1, 1) 1x1 conv
            _set(params, ["emb_features", "kernel"], val[:, :, 0, 0].T)
        elif parts[-2] == "conv" and parts[-1] == "weight":
            _set(params, parts[:-1] + ["kernel"],
                 np.transpose(val, (2, 3, 1, 0)))
        elif parts[-2] == "bn":
            leaf = {"weight": "scale", "bias": "bias"}.get(parts[-1])
            if leaf is not None:
                _set(params, parts[:-1] + [leaf], val)
            elif parts[-1] == "running_mean":
                _set(stats, parts[:-1] + ["mean"], val)
            elif parts[-1] == "running_var":
                _set(stats, parts[:-1] + ["var"], val)
        # num_batches_tracked and fc.* (classifier head, unused) are skipped
    return {"params": params, "batch_stats": stats}
