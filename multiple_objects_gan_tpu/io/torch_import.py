"""PyTorch .pth checkpoint importer (reference -> this framework).

The reference publishes trained models (README.md:49-54) saved as
``{'epoch', 'netG', 'optimG', 'netD', 'optimD'}`` dicts of state_dicts
(code/multi-mnist/miscc/utils.py:160-174). This module maps those
state_dict keys onto our Flax param/batch_stats trees so sampling from a
ported checkpoint reproduces reference outputs.

Conventions handled:
  * Conv2d weight OIHW -> HWIO transpose; Linear weight (out, in) -> (in, out)
  * BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
  * the reference mnist G's dead ``label`` module (model.py:137-140, unused
    in forward) is skipped
  * torch Sequential integer indices -> our named submodules
"""

from __future__ import annotations

import os
import numpy as np


def _conv(sd, key):
    return np.transpose(np.asarray(sd[key], np.float32), (2, 3, 1, 0))


def _linear(sd, key):
    return np.transpose(np.asarray(sd[key], np.float32), (1, 0))


def _bn(sd, prefix):
    """-> (params {scale, bias}, stats {mean, var})"""
    p = {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
         "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}
    s = {"mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
         "var": np.asarray(sd[f"{prefix}.running_var"], np.float32)}
    return p, s


def _upblock(sd, prefix):
    """torch upBlock Sequential: [Upsample, conv3x3, BN, ReLU] ->
    {Conv3x3_0: {Conv_0}, TorchBatchNorm_0} params + stats."""
    bn_p, bn_s = _bn(sd, f"{prefix}.2")
    params = {"Conv3x3_0": {"Conv_0": {"kernel": _conv(sd, f"{prefix}.1.weight")}},
              "TorchBatchNorm_0": bn_p}
    stats = {"TorchBatchNorm_0": bn_s}
    return params, stats


def import_stage1_g(checkpoint: dict, mcfg) -> tuple[dict, dict]:
    """Map a reference STAGE1_G state_dict -> (params, batch_stats).

    Source key layout: code/multi-mnist/model.py:113-157 (same skeleton for
    clevr/stackgan with extra label/ca_net modules).
    """
    sd = checkpoint["netG"] if "netG" in checkpoint else checkpoint
    sd = {k: v for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}

    # global fc: Sequential [Linear, BN1d, ReLU]
    params["fc"] = {"Dense_0": {"kernel": _linear(sd, "fc.0.weight")}}
    bn_p, bn_s = _bn(sd, "fc.1")
    params["fc_bn"] = bn_p
    stats["fc_bn"] = bn_s

    # object pathway: local1 + local2 upBlocks under ObjectPathwayG "local"
    l1_p, l1_s = _upblock(sd, "local1")
    l2_p, l2_s = _upblock(sd, "local2")
    params["local"] = {"UpBlock_0": l1_p, "UpBlock_1": l2_p}
    stats["local"] = {"UpBlock_0": l1_s, "UpBlock_1": l2_s}

    # global upsample blocks
    for i in range(1, 5):
        p, s = _upblock(sd, f"upsample{i}")
        params[f"upsample{i}"] = p
        stats[f"upsample{i}"] = s

    # output conv: Sequential [conv3x3, Tanh]
    params["img"] = {"Conv_0": {"kernel": _conv(sd, "img.0.weight")}}

    # layout encoder: Sequential encode = [conv, LReLU, conv, BN, LReLU,
    #                                      conv, BN, LReLU]
    if mcfg.use_bbox_layout and "bbox_net.encode.0.weight" in sd:
        bn1_p, bn1_s = _bn(sd, "bbox_net.encode.3")
        bn2_p, bn2_s = _bn(sd, "bbox_net.encode.6")
        params["bbox_net"] = {
            "Conv3x3_0": {"Conv_0": {"kernel": _conv(sd, "bbox_net.encode.0.weight")}},
            "Conv3x3_1": {"Conv_0": {"kernel": _conv(sd, "bbox_net.encode.2.weight")}},
            "Conv3x3_2": {"Conv_0": {"kernel": _conv(sd, "bbox_net.encode.5.weight")}},
            "TorchBatchNorm_0": bn1_p,
            "TorchBatchNorm_1": bn2_p,
        }
        stats["bbox_net"] = {"TorchBatchNorm_0": bn1_s,
                             "TorchBatchNorm_1": bn2_s}

    # learned label embedding (clevr/stackgan; dead in mnist -> skipped)
    if mcfg.use_label_embed and "label.0.weight" in sd:
        bn_p, bn_s = _bn(sd, "label.1")
        params["label"] = {"Dense_0": {"Dense_0": {"kernel": _linear(sd, "label.0.weight")}},
                           "TorchBatchNorm_0": bn_p}
        stats["label"] = {"TorchBatchNorm_0": bn_s}

    # CA net (stackgan)
    if mcfg.use_ca and "ca_net.fc.weight" in sd:
        params["ca_net"] = {"Dense_0": {"Dense_0": {
            "kernel": _linear(sd, "ca_net.fc.weight"),
            "bias": np.asarray(sd["ca_net.fc.bias"], np.float32)}}}

    return params, stats


def _resblock(sd, prefix):
    """torch ResBlock.block = [conv3x3, BN, ReLU, conv3x3, BN]."""
    bn1_p, bn1_s = _bn(sd, f"{prefix}.block.1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.block.4")
    params = {
        "Conv3x3_0": {"Conv_0": {"kernel": _conv(sd, f"{prefix}.block.0.weight")}},
        "Conv3x3_1": {"Conv_0": {"kernel": _conv(sd, f"{prefix}.block.3.weight")}},
        "TorchBatchNorm_0": bn1_p, "TorchBatchNorm_1": bn2_p}
    stats = {"TorchBatchNorm_0": bn1_s, "TorchBatchNorm_1": bn2_s}
    return params, stats


def import_stage2_g(checkpoint: dict, s1_cfg, s2_cfg, r_num: int = 2):
    """Map a reference STAGE2_G state_dict -> (s1 import, s2 params/stats).

    Source layout: code/coco/stackgan/model.py:311-442. The wrapped frozen
    STAGE1_G lives under the 'STAGE1_G.' prefix.
    """
    sd = checkpoint["netG"] if "netG" in checkpoint else checkpoint
    s1_sd = {k[len("STAGE1_G."):]: v for k, v in sd.items()
             if k.startswith("STAGE1_G.")}
    s1 = import_stage1_g(s1_sd, s1_cfg) if s1_sd else None

    params: dict = {}
    stats: dict = {}
    # encoder Sequential: [conv3x3, ReLU, conv4s2, BN, ReLU, conv4s2, BN, ReLU]
    # enc_conv0 is a Conv3x3 wrapper; enc_conv1/2 are raw nn.Conv
    params["enc_conv0"] = {"Conv_0": {"kernel": _conv(sd, "encoder.0.weight")}}
    params["enc_conv1"] = {"kernel": _conv(sd, "encoder.2.weight")}
    params["enc_conv2"] = {"kernel": _conv(sd, "encoder.5.weight")}
    for flax_name, tprefix in [("enc_bn1", "encoder.3"),
                               ("enc_bn2", "encoder.6")]:
        p, s = _bn(sd, tprefix)
        params[flax_name] = p
        stats[flax_name] = s

    params["ca_net"] = {"Dense_0": {"Dense_0": {
        "kernel": _linear(sd, "ca_net.fc.weight"),
        "bias": np.asarray(sd["ca_net.fc.bias"], np.float32)}}}
    bn_p, bn_s = _bn(sd, "label.1")
    params["label"] = {"Dense_0": {"Dense_0": {"kernel": _linear(sd, "label.0.weight")}},
                       "TorchBatchNorm_0": bn_p}
    stats["label"] = {"TorchBatchNorm_0": bn_s}

    hr_p, hr_s = _bn(sd, "hr_joint.1")
    params["hr_joint_conv"] = {"Conv_0": {"kernel": _conv(sd, "hr_joint.0.weight")}}
    params["hr_joint_bn"] = hr_p
    stats["hr_joint_bn"] = hr_s

    for i in range(r_num):
        p, s = _resblock(sd, f"residual.{i}")
        params[f"residual{i}"] = p
        stats[f"residual{i}"] = s

    for name in ["local1", "local2", "upsample1", "upsample2", "upsample3",
                 "upsample4"]:
        p, s = _upblock(sd, name)
        params[name] = p
        stats[name] = s
    params["img"] = {"Conv_0": {"kernel": _conv(sd, "img.0.weight")}}
    return s1, (params, stats)


def _upblock_glu(sd, prefix):
    """attngan upBlock: [Upsample, conv3x3(2f), BN(2f), GLU] ->
    UpBlockGLU {Conv3x3_0, TorchBatchNorm_0}."""
    bn_p, bn_s = _bn(sd, f"{prefix}.2")
    return ({"Conv3x3_0": {"Conv_0": {"kernel": _conv(sd, f"{prefix}.1.weight")}},
             "TorchBatchNorm_0": bn_p},
            {"TorchBatchNorm_0": bn_s})


def _resblock_glu(sd, prefix):
    """attngan ResBlock.block = [conv3x3(2f), BN, GLU, conv3x3(f), BN]."""
    bn1_p, bn1_s = _bn(sd, f"{prefix}.block.1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.block.4")
    return ({"Conv3x3_0": {"Conv_0": {"kernel": _conv(sd, f"{prefix}.block.0.weight")}},
             "Conv3x3_1": {"Conv_0": {"kernel": _conv(sd, f"{prefix}.block.3.weight")}},
             "TorchBatchNorm_0": bn1_p, "TorchBatchNorm_1": bn2_p},
            {"TorchBatchNorm_0": bn1_s, "TorchBatchNorm_1": bn2_s})


def import_attngan_g(checkpoint: dict, branch_num: int = 3,
                     r_num: int = 3) -> tuple[dict, dict]:
    """Map a reference G_NET state_dict (code/coco/attngan/model.py:478-528)
    -> (params, batch_stats) for models/attngan.py:GNet."""
    sd = checkpoint["netG"] if "netG" in checkpoint else checkpoint
    params: dict = {}
    stats: dict = {}

    params["ca_net"] = {"Dense_0": {"Dense_0": {
        "kernel": _linear(sd, "ca_net.fc.weight"),
        "bias": np.asarray(sd["ca_net.fc.bias"], np.float32)}}}

    # ---- INIT_STAGE_G (h_net1, model.py:348-422) ----
    h1_p: dict = {}
    h1_s: dict = {}
    h1_p["label_fc"] = {"kernel": _linear(sd, "h_net1.label.0.weight")}
    bn_p, bn_s = _bn(sd, "h_net1.label.1")
    h1_p["label_bn"] = bn_p
    h1_s["label_bn"] = bn_s
    h1_p["fc"] = {"kernel": _linear(sd, "h_net1.fc.0.weight")}
    bn_p, bn_s = _bn(sd, "h_net1.fc.1")
    h1_p["fc_bn"] = bn_p
    h1_s["fc_bn"] = bn_s
    # layout encoder
    bn1_p, bn1_s = _bn(sd, "h_net1.bbox_net.encode.3")
    bn2_p, bn2_s = _bn(sd, "h_net1.bbox_net.encode.6")
    h1_p["bbox_net"] = {
        "Conv3x3_0": {"Conv_0": {"kernel": _conv(sd, "h_net1.bbox_net.encode.0.weight")}},
        "Conv3x3_1": {"Conv_0": {"kernel": _conv(sd, "h_net1.bbox_net.encode.2.weight")}},
        "Conv3x3_2": {"Conv_0": {"kernel": _conv(sd, "h_net1.bbox_net.encode.5.weight")}},
        "TorchBatchNorm_0": bn1_p, "TorchBatchNorm_1": bn2_p}
    h1_s["bbox_net"] = {"TorchBatchNorm_0": bn1_s, "TorchBatchNorm_1": bn2_s}
    loc_p: dict = {}
    loc_s: dict = {}
    for name in ("local1", "local2"):
        p, s = _upblock_glu(sd, f"h_net1.{name}")
        loc_p[name] = p
        loc_s[name] = s
    h1_p["local"] = loc_p
    h1_s["local"] = loc_s
    for i in range(1, 5):
        p, s = _upblock_glu(sd, f"h_net1.upsample{i}")
        h1_p[f"upsample{i}"] = p
        h1_s[f"upsample{i}"] = s
    params["h_net1"] = h1_p
    stats["h_net1"] = h1_s

    # ---- NEXT_STAGE_G x (branch_num - 1) + image heads ----
    for b in range(2, branch_num + 1):
        hb_p: dict = {"att": {"conv_context": {
            "kernel": np.asarray(sd[f"h_net{b}.att.conv_context.weight"],
                                 np.float32)[:, :, 0, 0].T}}}
        hb_s: dict = {}
        for i in range(r_num):
            p, s = _resblock_glu(sd, f"h_net{b}.residual.{i}")
            hb_p[f"residual{i}"] = p
            hb_s[f"residual{i}"] = s
        p, s = _upblock_glu(sd, f"h_net{b}.upsample")
        hb_p["upsample"] = p
        hb_s["upsample"] = s
        params[f"h_net{b}"] = hb_p
        stats[f"h_net{b}"] = hb_s
    for b in range(1, branch_num + 1):
        params[f"img_net{b}"] = {"img": {"Conv_0": {
            "kernel": _conv(sd, f"img_net{b}.img.0.weight")}}}

    return params, stats


def _attngan_d_heads(sd) -> tuple[dict, dict]:
    """COND_DNET / UNCOND_DNET (D_GET_LOGITS with Sigmoid,
    code/coco/attngan/model.py:616-642) -> cond_head/uncond_head trees."""
    jbn_p, jbn_s = _bn(sd, "COND_DNET.jointConv.1")
    params = {"cond_head": {
        "jointConv": {
            "Conv3x3_0": {"Conv_0": {
                "kernel": _conv(sd, "COND_DNET.jointConv.0.weight")}},
            "TorchBatchNorm_0": jbn_p},
        "outlogits": {
            "kernel": _conv(sd, "COND_DNET.outlogits.0.weight"),
            "bias": np.asarray(sd["COND_DNET.outlogits.0.bias"],
                               np.float32)}}}
    stats = {"cond_head": {"jointConv": {"TorchBatchNorm_0": jbn_s}}}
    if "UNCOND_DNET.outlogits.0.weight" in sd:
        params["uncond_head"] = {"outlogits": {
            "kernel": _conv(sd, "UNCOND_DNET.outlogits.0.weight"),
            "bias": np.asarray(sd["UNCOND_DNET.outlogits.0.bias"],
                               np.float32)}}
    return params, stats


def import_attngan_d(checkpoint: dict, scale: int) -> tuple[dict, dict]:
    """Map a reference D_NET64/128/256 state_dict (netD%d.pth, saved bare —
    code/coco/attngan/trainer.py:119-126,185-191) -> (params, batch_stats).

    scale 64: object-pathway D (model.py:646-711); 128/256: plain
    multi-scale stacks (model.py:715-760).
    """
    sd = checkpoint["netD"] if "netD" in checkpoint else checkpoint
    params, stats = _attngan_d_heads(sd)
    if scale == 64:
        lbn_p, lbn_s = _bn(sd, "local.1")
        params["local_conv"] = {"kernel": _conv(sd, "local.0.weight")}
        params["local_bn"] = lbn_p
        stats["local_bn"] = lbn_s
        for i in range(1, 5):
            params[f"conv{i}"] = {"kernel": _conv(sd, f"conv{i}.weight")}
        for i in (2, 3, 4):
            p, s = _bn(sd, f"bn{i}")
            params[f"bn{i}"] = p
            stats[f"bn{i}"] = s
        return params, stats

    s16_p: dict = {}
    s16_s: dict = {}
    for j, (ci, bi) in enumerate([(0, None), (2, 3), (5, 6), (8, 9)]):
        s16_p[f"Conv_{j}"] = {"kernel": _conv(sd, f"img_code_s16.{ci}.weight")}
        if bi is not None:
            p, s = _bn(sd, f"img_code_s16.{bi}")
            s16_p[f"TorchBatchNorm_{j - 1}"] = p
            s16_s[f"TorchBatchNorm_{j - 1}"] = s
    params["img_code_s16"] = s16_p
    stats["img_code_s16"] = s16_s
    down = ["img_code_s32"] + (["img_code_s64"] if scale == 256 else [])
    for name in down:  # downBlock: [conv4s2, BN, LReLU]
        p, s = _bn(sd, f"{name}.1")
        params[name] = {"Conv_0": {"kernel": _conv(sd, f"{name}.0.weight")},
                        "TorchBatchNorm_0": p}
        stats[name] = {"TorchBatchNorm_0": s}
    blocks = (["img_code_s32_1"] if scale == 128
              else ["img_code_s64_1", "img_code_s64_2"])
    for name in blocks:  # Block3x3_leakRelu: [conv3x3, BN, LReLU]
        p, s = _bn(sd, f"{name}.1")
        params[name] = {
            "Conv3x3_0": {"Conv_0": {"kernel": _conv(sd, f"{name}.0.weight")}},
            "TorchBatchNorm_0": p}
        stats[name] = {"TorchBatchNorm_0": s}
    return params, stats


def load_torch_checkpoint(path: str) -> dict:
    from multiple_objects_gan_tpu.io.pycompat import torch_load

    # torch_load: the published .pth files were written by py2 torch-0.4
    ckpt = torch_load(path)
    out = {}
    for top_k, top_v in ckpt.items():
        if hasattr(top_v, "items"):
            out[top_k] = {k: v.numpy() if hasattr(v, "numpy") else v
                          for k, v in top_v.items()}
        else:
            out[top_k] = top_v
    return out


def import_stage1_d(checkpoint: dict, mcfg) -> tuple[dict, dict]:
    """Map a reference STAGE1_D state_dict -> (params, batch_stats).

    Source layout: code/multi-mnist/model.py:193-257 (+ D_GET_LOGITS
    :43-70); the reference saves netD as a BARE state_dict
    (miscc/utils.py:165-168) and warm-starts it at trainer.py:64-68.
    """
    sd = checkpoint["netD"] if "netD" in checkpoint else checkpoint
    lbn_p, lbn_s = _bn(sd, "local.1")
    hbn_p, hbn_s = _bn(sd, "get_cond_logits.outlogits.1")
    params = {
        "local": {"Conv_0": {"kernel": _conv(sd, "local.0.weight")},
                  "TorchBatchNorm_0": lbn_p},
        "conv1": {"kernel": _conv(sd, "conv1.weight")},
        "conv2": {"kernel": _conv(sd, "conv2.weight")},
        "conv3": {"kernel": _conv(sd, "conv3.weight")},
        "conv4": {"kernel": _conv(sd, "conv4.weight")},
        "get_cond_logits": {
            "Conv3x3_0": {"Conv_0": {
                "kernel": _conv(sd, "get_cond_logits.outlogits.0.weight")}},
            "TorchBatchNorm_0": hbn_p,
            "Conv_0": {
                "kernel": _conv(sd, "get_cond_logits.outlogits.3.weight"),
                "bias": np.asarray(sd["get_cond_logits.outlogits.3.bias"],
                                   np.float32)}},
    }
    stats = {"local": {"TorchBatchNorm_0": lbn_s},
             "get_cond_logits": {"TorchBatchNorm_0": hbn_s}}
    for i in (2, 3, 4):
        p, s = _bn(sd, f"bn{i}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    if "get_uncond_logits.outlogits.0.weight" in sd:  # stage-2-style head
        params["get_uncond_logits"] = {"Conv_0": {
            "kernel": _conv(sd, "get_uncond_logits.outlogits.0.weight"),
            "bias": np.asarray(sd["get_uncond_logits.outlogits.0.bias"],
                               np.float32)}}
    return params, stats


def import_stage2_d(checkpoint: dict) -> tuple[dict, dict]:
    """Map a reference STAGE2_D state_dict -> (params, batch_stats).

    Source layout: code/coco/stackgan/model.py:445-537 (two-conv local
    block at 32x32, conv1-6 stride-2 + conv7/8 3x3, cond + uncond heads).
    """
    sd = checkpoint["netD"] if "netD" in checkpoint else checkpoint
    params: dict = {}
    stats: dict = {}
    for flax_name, tconv, tbn in [("local_conv1", "local.0", "local.1"),
                                  ("local_conv2", "local.3", "local.4")]:
        params[flax_name] = {"kernel": _conv(sd, f"{tconv}.weight")}
        bn_name = flax_name.replace("conv", "bn")
        p, s = _bn(sd, tbn)
        params[bn_name] = p
        stats[bn_name] = s
    for i in range(1, 7):
        params[f"conv{i}"] = {"kernel": _conv(sd, f"conv{i}.weight")}
    for i in (7, 8):  # Conv3x3 wrappers
        params[f"conv{i}"] = {"Conv_0": {"kernel": _conv(sd, f"conv{i}.weight")}}
    for i in range(2, 9):
        p, s = _bn(sd, f"bn{i}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    hbn_p, hbn_s = _bn(sd, "get_cond_logits.outlogits.1")
    params["get_cond_logits"] = {
        "Conv3x3_0": {"Conv_0": {
            "kernel": _conv(sd, "get_cond_logits.outlogits.0.weight")}},
        "TorchBatchNorm_0": hbn_p,
        "Conv_0": {"kernel": _conv(sd, "get_cond_logits.outlogits.3.weight"),
                   "bias": np.asarray(sd["get_cond_logits.outlogits.3.bias"],
                                      np.float32)}}
    stats["get_cond_logits"] = {"TorchBatchNorm_0": hbn_s}
    params["get_uncond_logits"] = {"Conv_0": {
        "kernel": _conv(sd, "get_uncond_logits.outlogits.0.weight"),
        "bias": np.asarray(sd["get_uncond_logits.outlogits.0.bias"],
                           np.float32)}}
    return params, stats


def maybe_load_reference_g(net_g_path: str, mcfg, state):
    """If NET_G points at a reference .pth, import G weights into state."""
    if not net_g_path or not os.path.exists(net_g_path):
        return None
    ckpt = load_torch_checkpoint(net_g_path)
    params, stats = import_stage1_g(ckpt, mcfg)
    merged_params = {**state.g_params, **params}
    merged_stats = {**state.g_stats, **stats}
    return state.replace(g_params=merged_params, g_stats=merged_stats)


def maybe_load_reference_d(net_d_path: str, mcfg, state):
    """If NET_D points at a reference .pth, import D weights into state."""
    if not net_d_path or not os.path.exists(net_d_path):
        return None
    ckpt = load_torch_checkpoint(net_d_path)
    params, stats = import_stage1_d(ckpt, mcfg)
    merged_params = {**state.d_params, **params}
    merged_stats = {**state.d_stats, **stats}
    return state.replace(d_params=merged_params, d_stats=merged_stats)
