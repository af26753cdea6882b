"""Reference-format .pth checkpoint exporter (this framework -> PyTorch).

Exact inverses of io/torch_import: write Flax (params, batch_stats) trees
as torch state_dicts with the reference's key names, so models trained
here load straight into the PyTorch reference (load_network_stageI,
code/multi-mnist/trainer.py:59-68; attngan build_models,
code/coco/attngan/trainer.py:85-107) and into any torch tooling. Together
with io/torch_import this makes checkpoint interop bidirectional — the
DAMSM encoders already round-trip via io/damsm_export.

Container format mirrors the reference's save_model
(code/multi-mnist/miscc/utils.py:160-174):
``{'epoch', 'netG', 'optimG', 'netD', 'optimD'}`` — optimizer entries
export empty ({}), exactly like the reference's default
``saveOptim=False``; optax Adam moments have no 1:1 torch serialization.

The mnist STAGE1_G defines a dead ``label`` module
(code/multi-mnist/model.py:137-140) that is absent from our model; a
strict ``load_state_dict`` in the reference expects its keys, so
export_stage1_g synthesizes them (identity-flavored inert values) when
the variant has no live label embedding.

Every exporter returns ``{torch_key: np.float32 ndarray}``; use
save_reference_checkpoint / torch.save for the on-disk .pth.
"""

from __future__ import annotations

import numpy as np


def _conv(k):  # HWIO -> OIHW
    return np.transpose(np.asarray(k, np.float32), (3, 2, 0, 1))


def _linear(k):  # (in, out) -> (out, in)
    return np.transpose(np.asarray(k, np.float32), (1, 0))


def _f32(v):
    return np.asarray(v, np.float32)


def _bn(out: dict, prefix: str, p: dict, s: dict) -> None:
    out[f"{prefix}.weight"] = _f32(p["scale"])
    out[f"{prefix}.bias"] = _f32(p["bias"])
    out[f"{prefix}.running_mean"] = _f32(s["mean"])
    out[f"{prefix}.running_var"] = _f32(s["var"])
    # torch >= 1.0 BatchNorm strict-load key (absent in the 0.4-era
    # reference, ignored by our importer, required by modern replicas)
    out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def _upblock(out: dict, prefix: str, p: dict, s: dict) -> None:
    """Inverse of torch_import._upblock (same layout for the GLU variant:
    [Upsample, conv3x3, BN, act])."""
    out[f"{prefix}.1.weight"] = _conv(p["Conv3x3_0"]["Conv_0"]["kernel"])
    _bn(out, f"{prefix}.2", p["TorchBatchNorm_0"], s["TorchBatchNorm_0"])


def _resblock(out: dict, prefix: str, p: dict, s: dict) -> None:
    """Inverse of torch_import._resblock / _resblock_glu
    (block = [conv3x3, BN, act, conv3x3, BN])."""
    out[f"{prefix}.block.0.weight"] = _conv(p["Conv3x3_0"]["Conv_0"]["kernel"])
    _bn(out, f"{prefix}.block.1", p["TorchBatchNorm_0"],
        s["TorchBatchNorm_0"])
    out[f"{prefix}.block.3.weight"] = _conv(p["Conv3x3_1"]["Conv_0"]["kernel"])
    _bn(out, f"{prefix}.block.4", p["TorchBatchNorm_1"],
        s["TorchBatchNorm_1"])


def _bbox_net(out: dict, prefix: str, p: dict, s: dict) -> None:
    """LayoutEncoder -> BBOX_NET.encode Sequential
    [conv, act, conv, BN, act, conv, BN, act]."""
    out[f"{prefix}.encode.0.weight"] = _conv(p["Conv3x3_0"]["Conv_0"]["kernel"])
    out[f"{prefix}.encode.2.weight"] = _conv(p["Conv3x3_1"]["Conv_0"]["kernel"])
    out[f"{prefix}.encode.5.weight"] = _conv(p["Conv3x3_2"]["Conv_0"]["kernel"])
    _bn(out, f"{prefix}.encode.3", p["TorchBatchNorm_0"],
        s["TorchBatchNorm_0"])
    _bn(out, f"{prefix}.encode.6", p["TorchBatchNorm_1"],
        s["TorchBatchNorm_1"])


def export_stage1_g(params: dict, stats: dict, mcfg) -> dict:
    """Inverse of import_stage1_g (STAGE1_G for mnist/clevr/stackgan-s1)."""
    sd: dict = {}
    sd["fc.0.weight"] = _linear(params["fc"]["Dense_0"]["kernel"])
    _bn(sd, "fc.1", params["fc_bn"], stats["fc_bn"])
    _upblock(sd, "local1", params["local"]["UpBlock_0"],
             stats["local"]["UpBlock_0"])
    _upblock(sd, "local2", params["local"]["UpBlock_1"],
             stats["local"]["UpBlock_1"])
    for i in range(1, 5):
        _upblock(sd, f"upsample{i}", params[f"upsample{i}"],
                 stats[f"upsample{i}"])
    sd["img.0.weight"] = _conv(params["img"]["Conv_0"]["kernel"])
    if "bbox_net" in params:
        _bbox_net(sd, "bbox_net", params["bbox_net"], stats["bbox_net"])
    if "label" in params:
        sd["label.0.weight"] = _linear(
            params["label"]["Dense_0"]["Dense_0"]["kernel"])
        _bn(sd, "label.1", params["label"]["TorchBatchNorm_0"],
            stats["label"]["TorchBatchNorm_0"])
    elif getattr(mcfg, "variant", "") == "mnist" or not mcfg.use_label_embed:
        # dead module (model.py:137-140): Linear(10, 10) + BatchNorm1d(10)
        e = mcfg.label_dim
        sd["label.0.weight"] = np.zeros((e, e), np.float32)
        _bn(sd, "label.1",
            {"scale": np.ones((e,), np.float32),
             "bias": np.zeros((e,), np.float32)},
            {"mean": np.zeros((e,), np.float32),
             "var": np.ones((e,), np.float32)})
    if "ca_net" in params:
        k = params["ca_net"]["Dense_0"]["Dense_0"]
        sd["ca_net.fc.weight"] = _linear(k["kernel"])
        sd["ca_net.fc.bias"] = _f32(k["bias"])
    return sd


def export_stage1_d(params: dict, stats: dict) -> dict:
    """Inverse of import_stage1_d (STAGE1_D + D_GET_LOGITS)."""
    sd: dict = {}
    sd["local.0.weight"] = _conv(params["local"]["Conv_0"]["kernel"])
    _bn(sd, "local.1", params["local"]["TorchBatchNorm_0"],
        stats["local"]["TorchBatchNorm_0"])
    for i in range(1, 5):
        sd[f"conv{i}.weight"] = _conv(params[f"conv{i}"]["kernel"])
    for i in (2, 3, 4):
        _bn(sd, f"bn{i}", params[f"bn{i}"], stats[f"bn{i}"])
    h = params["get_cond_logits"]
    sd["get_cond_logits.outlogits.0.weight"] = _conv(
        h["Conv3x3_0"]["Conv_0"]["kernel"])
    _bn(sd, "get_cond_logits.outlogits.1", h["TorchBatchNorm_0"],
        stats["get_cond_logits"]["TorchBatchNorm_0"])
    sd["get_cond_logits.outlogits.3.weight"] = _conv(h["Conv_0"]["kernel"])
    sd["get_cond_logits.outlogits.3.bias"] = _f32(h["Conv_0"]["bias"])
    if "get_uncond_logits" in params:
        u = params["get_uncond_logits"]["Conv_0"]
        sd["get_uncond_logits.outlogits.0.weight"] = _conv(u["kernel"])
        sd["get_uncond_logits.outlogits.0.bias"] = _f32(u["bias"])
    return sd


def export_stage2_g(s1_params: dict | None, s1_stats: dict | None,
                    params: dict, stats: dict, s1_cfg,
                    r_num: int = 2) -> dict:
    """Inverse of import_stage2_g; the wrapped frozen STAGE1_G exports
    under the 'STAGE1_G.' prefix (code/coco/stackgan/model.py:317-320).
    Pass s1_params=None to export the stage-2 net alone."""
    sd = ({f"STAGE1_G.{k}": v
           for k, v in export_stage1_g(s1_params, s1_stats, s1_cfg).items()}
          if s1_params is not None else {})
    sd["encoder.0.weight"] = _conv(params["enc_conv0"]["Conv_0"]["kernel"])
    sd["encoder.2.weight"] = _conv(params["enc_conv1"]["kernel"])
    sd["encoder.5.weight"] = _conv(params["enc_conv2"]["kernel"])
    _bn(sd, "encoder.3", params["enc_bn1"], stats["enc_bn1"])
    _bn(sd, "encoder.6", params["enc_bn2"], stats["enc_bn2"])
    k = params["ca_net"]["Dense_0"]["Dense_0"]
    sd["ca_net.fc.weight"] = _linear(k["kernel"])
    sd["ca_net.fc.bias"] = _f32(k["bias"])
    sd["label.0.weight"] = _linear(
        params["label"]["Dense_0"]["Dense_0"]["kernel"])
    _bn(sd, "label.1", params["label"]["TorchBatchNorm_0"],
        stats["label"]["TorchBatchNorm_0"])
    sd["hr_joint.0.weight"] = _conv(params["hr_joint_conv"]["Conv_0"]["kernel"])
    _bn(sd, "hr_joint.1", params["hr_joint_bn"], stats["hr_joint_bn"])
    for i in range(r_num):
        _resblock(sd, f"residual.{i}", params[f"residual{i}"],
                  stats[f"residual{i}"])
    for name in ("local1", "local2", "upsample1", "upsample2", "upsample3",
                 "upsample4"):
        _upblock(sd, name, params[name], stats[name])
    sd["img.0.weight"] = _conv(params["img"]["Conv_0"]["kernel"])
    return sd


def export_stage2_d(params: dict, stats: dict) -> dict:
    """Inverse of import_stage2_d (STAGE2_D, cond + uncond heads)."""
    sd: dict = {}
    sd["local.0.weight"] = _conv(params["local_conv1"]["kernel"])
    _bn(sd, "local.1", params["local_bn1"], stats["local_bn1"])
    sd["local.3.weight"] = _conv(params["local_conv2"]["kernel"])
    _bn(sd, "local.4", params["local_bn2"], stats["local_bn2"])
    for i in range(1, 7):
        sd[f"conv{i}.weight"] = _conv(params[f"conv{i}"]["kernel"])
    for i in (7, 8):
        sd[f"conv{i}.weight"] = _conv(params[f"conv{i}"]["Conv_0"]["kernel"])
    for i in range(2, 9):
        _bn(sd, f"bn{i}", params[f"bn{i}"], stats[f"bn{i}"])
    h = params["get_cond_logits"]
    sd["get_cond_logits.outlogits.0.weight"] = _conv(
        h["Conv3x3_0"]["Conv_0"]["kernel"])
    _bn(sd, "get_cond_logits.outlogits.1", h["TorchBatchNorm_0"],
        stats["get_cond_logits"]["TorchBatchNorm_0"])
    sd["get_cond_logits.outlogits.3.weight"] = _conv(h["Conv_0"]["kernel"])
    sd["get_cond_logits.outlogits.3.bias"] = _f32(h["Conv_0"]["bias"])
    u = params["get_uncond_logits"]["Conv_0"]
    sd["get_uncond_logits.outlogits.0.weight"] = _conv(u["kernel"])
    sd["get_uncond_logits.outlogits.0.bias"] = _f32(u["bias"])
    return sd


def export_attngan_g(params: dict, stats: dict, branch_num: int = 3,
                     r_num: int = 3) -> dict:
    """Inverse of import_attngan_g (G_NET,
    code/coco/attngan/model.py:478-528)."""
    sd: dict = {}
    k = params["ca_net"]["Dense_0"]["Dense_0"]
    sd["ca_net.fc.weight"] = _linear(k["kernel"])
    sd["ca_net.fc.bias"] = _f32(k["bias"])

    h1_p, h1_s = params["h_net1"], stats["h_net1"]
    sd["h_net1.label.0.weight"] = _linear(h1_p["label_fc"]["kernel"])
    _bn(sd, "h_net1.label.1", h1_p["label_bn"], h1_s["label_bn"])
    sd["h_net1.fc.0.weight"] = _linear(h1_p["fc"]["kernel"])
    _bn(sd, "h_net1.fc.1", h1_p["fc_bn"], h1_s["fc_bn"])
    _bbox_net(sd, "h_net1.bbox_net", h1_p["bbox_net"], h1_s["bbox_net"])
    for name in ("local1", "local2"):
        _upblock(sd, f"h_net1.{name}", h1_p["local"][name],
                 h1_s["local"][name])
    for i in range(1, 5):
        _upblock(sd, f"h_net1.upsample{i}", h1_p[f"upsample{i}"],
                 h1_s[f"upsample{i}"])

    for b in range(2, branch_num + 1):
        hb_p, hb_s = params[f"h_net{b}"], stats[f"h_net{b}"]
        # conv_context: Dense (idf, ef) <- torch conv1x1 (ef, idf, 1, 1)
        sd[f"h_net{b}.att.conv_context.weight"] = np.transpose(
            _f32(hb_p["att"]["conv_context"]["kernel"]),
            (1, 0))[:, :, None, None]
        for i in range(r_num):
            _resblock(sd, f"h_net{b}.residual.{i}", hb_p[f"residual{i}"],
                      hb_s[f"residual{i}"])
        _upblock(sd, f"h_net{b}.upsample", hb_p["upsample"],
                 hb_s["upsample"])
    for b in range(1, branch_num + 1):
        sd[f"img_net{b}.img.0.weight"] = _conv(
            params[f"img_net{b}"]["img"]["Conv_0"]["kernel"])
    return sd


def export_attngan_d(params: dict, stats: dict, scale: int) -> dict:
    """Inverse of import_attngan_d (D_NET64/128/256 -> bare netD%d.pth
    state_dict, code/coco/attngan/trainer.py:119-126,185-191)."""
    sd: dict = {}
    h = params["cond_head"]
    sd["COND_DNET.jointConv.0.weight"] = _conv(
        h["jointConv"]["Conv3x3_0"]["Conv_0"]["kernel"])
    _bn(sd, "COND_DNET.jointConv.1", h["jointConv"]["TorchBatchNorm_0"],
        stats["cond_head"]["jointConv"]["TorchBatchNorm_0"])
    sd["COND_DNET.outlogits.0.weight"] = _conv(h["outlogits"]["kernel"])
    sd["COND_DNET.outlogits.0.bias"] = _f32(h["outlogits"]["bias"])
    if "uncond_head" in params:
        u = params["uncond_head"]["outlogits"]
        sd["UNCOND_DNET.outlogits.0.weight"] = _conv(u["kernel"])
        sd["UNCOND_DNET.outlogits.0.bias"] = _f32(u["bias"])
    if scale == 64:
        sd["local.0.weight"] = _conv(params["local_conv"]["kernel"])
        _bn(sd, "local.1", params["local_bn"], stats["local_bn"])
        for i in range(1, 5):
            sd[f"conv{i}.weight"] = _conv(params[f"conv{i}"]["kernel"])
        for i in (2, 3, 4):
            _bn(sd, f"bn{i}", params[f"bn{i}"], stats[f"bn{i}"])
        return sd
    for j, (ci, bi) in enumerate([(0, None), (2, 3), (5, 6), (8, 9)]):
        sd[f"img_code_s16.{ci}.weight"] = _conv(
            params["img_code_s16"][f"Conv_{j}"]["kernel"])
        if bi is not None:
            _bn(sd, f"img_code_s16.{bi}",
                params["img_code_s16"][f"TorchBatchNorm_{j - 1}"],
                stats["img_code_s16"][f"TorchBatchNorm_{j - 1}"])
    down = ["img_code_s32"] + (["img_code_s64"] if scale == 256 else [])
    for name in down:
        sd[f"{name}.0.weight"] = _conv(params[name]["Conv_0"]["kernel"])
        _bn(sd, f"{name}.1", params[name]["TorchBatchNorm_0"],
            stats[name]["TorchBatchNorm_0"])
    blocks = (["img_code_s32_1"] if scale == 128
              else ["img_code_s64_1", "img_code_s64_2"])
    for name in blocks:
        sd[f"{name}.0.weight"] = _conv(
            params[name]["Conv3x3_0"]["Conv_0"]["kernel"])
        _bn(sd, f"{name}.1", params[name]["TorchBatchNorm_0"],
            stats[name]["TorchBatchNorm_0"])
    return sd


def _to_torch(sd: dict | None) -> dict:
    import torch
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in (sd or {}).items()}


def save_bare_state_dict(sd: dict, path: str) -> None:
    """torch.save a bare state_dict (the reference's NET_D / netD%d.pth
    format, trainer.py:64-68 and attngan trainer.py:119-126)."""
    import torch
    torch.save(_to_torch(sd), path)


def save_reference_checkpoint(path: str, epoch: int,
                              net_g: dict | None = None,
                              net_d: dict | None = None) -> None:
    """Write the reference's checkpoint container
    ({'epoch','netG','optimG','netD','optimD'}, miscc/utils.py:160-174)."""
    import torch

    torch.save({"epoch": epoch, "netG": _to_torch(net_g), "optimG": {},
                "netD": _to_torch(net_d), "optimD": {}}, path)
