"""DAMSM encoder checkpoint exporter (text_encoder*.pth / image_encoder*.pth).

Exact inverse of io/damsm_import: writes the Flax RNNEncoder / CNNEncoder
variable trees as torch state_dicts with the reference key names
(code/coco/attngan/model.py:120-313, i.e. the format of the published
AttnGAN DAMSM checkpoints the reference README tells users to download —
README.md:33-35). Encoders pretrained in this framework
(train/damsm_step.py) therefore load through the existing, parity-tested
NET_E import path — and into the PyTorch reference itself.

Key mapping (mirror of damsm_import):
  * encoder (ntoken, 300)            -> encoder.weight
  * rnn_fwd/rnn_bwd {w_ih, w_hh, b_ih, b_hh}
                                     -> rnn.{weight,bias}_{ih,hh}_l0[_reverse]
  * <module path>.conv kernel HWIO   -> <path>.conv.weight OIHW
  * <module path>.bn scale/bias      -> <path>.bn.{weight,bias}
    batch_stats mean/var             -> <path>.bn.running_{mean,var}
    (+ a zero num_batches_tracked per BN, for modern-torch strictness)
  * emb_cnn_code Dense kernel/bias   -> emb_cnn_code.{weight,bias} (w.T)
  * emb_features Dense kernel        -> emb_features.weight (nef, 768, 1, 1)
"""

from __future__ import annotations

import numpy as np


def _t(v):
    import torch
    # copy: jax arrays export non-writable buffers, which torch warns about
    return torch.from_numpy(np.array(v, np.float32, copy=True))


def export_text_encoder(variables: dict, path: str) -> None:
    import torch

    p = variables["params"]
    sd = {"encoder.weight": _t(p["encoder"])}
    for src, dst in [("rnn_fwd", ""), ("rnn_bwd", "_reverse")]:
        sd[f"rnn.weight_ih_l0{dst}"] = _t(p[src]["w_ih"])
        sd[f"rnn.weight_hh_l0{dst}"] = _t(p[src]["w_hh"])
        sd[f"rnn.bias_ih_l0{dst}"] = _t(p[src]["b_ih"])
        sd[f"rnn.bias_hh_l0{dst}"] = _t(p[src]["b_hh"])
    torch.save(sd, path)


def _walk(tree: dict, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def export_image_encoder(variables: dict, path: str) -> None:
    import torch

    sd = {}
    for keypath, val in _walk(variables["params"]):
        name = ".".join(keypath[:-1])
        leaf = keypath[-1]
        val = np.asarray(val, np.float32)
        if keypath == ("emb_cnn_code", "kernel"):
            sd["emb_cnn_code.weight"] = _t(val.T)
        elif keypath == ("emb_cnn_code", "bias"):
            sd["emb_cnn_code.bias"] = _t(val)
        elif keypath == ("emb_features", "kernel"):
            # Dense (768, nef) -> 1x1 conv (nef, 768, 1, 1)
            sd["emb_features.weight"] = _t(val.T[:, :, None, None])
        elif keypath[-2] == "conv" and leaf == "kernel":   # HWIO -> OIHW
            sd[name + ".weight"] = _t(np.transpose(val, (3, 2, 0, 1)))
        elif keypath[-2] == "bn":
            sd[name + "." + {"scale": "weight", "bias": "bias"}[leaf]] = \
                _t(val)
    for keypath, val in _walk(variables.get("batch_stats", {})):
        name = ".".join(keypath[:-1])
        if keypath[-2] == "bn" and keypath[-1] in ("mean", "var"):
            sd[f"{name}.running_{keypath[-1]}"] = _t(val)
            sd.setdefault(f"{name}.num_batches_tracked",
                          torch.zeros((), dtype=torch.long))
    torch.save(sd, path)
