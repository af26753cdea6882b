"""AttnGAN G_NET .pth importer: structure + transform correctness.

Builds a reference-key-named state dict whose array shapes are derived by
inverting the importer's transforms from a real (tiny) flax GNet tree, then
checks the imported tree matches the flax init structure exactly and that
values round-trip through the layout transposes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.io.torch_import import import_attngan_g
from multiple_objects_gan_tpu.models.attngan import COCO_ATTN, GNet

CFG = dataclasses.replace(COCO_ATTN, gf_dim=8, df_dim=8, condition_dim=16,
                          embedding_dim=16, branch_num=2, r_num=1)
T = 5


def _flax_variables():
    g = GNet(CFG)
    b = 2
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((b, CFG.z_dim))
    sent = jnp.zeros((b, CFG.embedding_dim))
    words = jnp.zeros((b, T, CFG.embedding_dim))
    mask = jnp.zeros((b, T), bool)
    bbox = jnp.tile(jnp.array([0.25, 0.25, 0.5, 0.5]), (b, 3, 1))
    labels = jnp.zeros((b, 3, 81)).at[:, :, 0].set(1.0)
    return g, jax.jit(lambda r: g.init(r, z, sent, words, mask, bbox, labels,
                                       train=False, ca_rng=None))(rng)


def _torch_sd_from_flax(params, stats):
    """Inverse-map the flax tree to reference torch keys/shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(flax_kernel):
        o = rng.randn(*np.transpose(flax_kernel, (3, 2, 0, 1)).shape)
        return o.astype(np.float32)

    def put_bn(prefix, bn_p, bn_s):
        sd[f"{prefix}.weight"] = rng.randn(*bn_p["scale"].shape).astype("f")
        sd[f"{prefix}.bias"] = rng.randn(*bn_p["bias"].shape).astype("f")
        sd[f"{prefix}.running_mean"] = rng.randn(
            *bn_s["mean"].shape).astype("f")
        sd[f"{prefix}.running_var"] = np.abs(rng.randn(
            *bn_s["var"].shape)).astype("f") + 0.5

    p, s = params, stats
    sd["ca_net.fc.weight"] = rng.randn(
        *p["ca_net"]["Dense_0"]["Dense_0"]["kernel"].T.shape).astype("f")
    sd["ca_net.fc.bias"] = rng.randn(
        *p["ca_net"]["Dense_0"]["Dense_0"]["bias"].shape).astype("f")

    h1p, h1s = p["h_net1"], s["h_net1"]
    sd["h_net1.label.0.weight"] = rng.randn(
        *h1p["label_fc"]["kernel"].T.shape).astype("f")
    put_bn("h_net1.label.1", h1p["label_bn"], h1s["label_bn"])
    sd["h_net1.fc.0.weight"] = rng.randn(
        *h1p["fc"]["kernel"].T.shape).astype("f")
    put_bn("h_net1.fc.1", h1p["fc_bn"], h1s["fc_bn"])
    for idx, cname in [(0, "Conv3x3_0"), (2, "Conv3x3_1"), (5, "Conv3x3_2")]:
        sd[f"h_net1.bbox_net.encode.{idx}.weight"] = conv(
            h1p["bbox_net"][cname]["Conv_0"]["kernel"])
    put_bn("h_net1.bbox_net.encode.3", h1p["bbox_net"]["TorchBatchNorm_0"],
           h1s["bbox_net"]["TorchBatchNorm_0"])
    put_bn("h_net1.bbox_net.encode.6", h1p["bbox_net"]["TorchBatchNorm_1"],
           h1s["bbox_net"]["TorchBatchNorm_1"])
    for name in ("local1", "local2"):
        sd[f"h_net1.{name}.1.weight"] = conv(
            h1p["local"][name]["Conv3x3_0"]["Conv_0"]["kernel"])
        put_bn(f"h_net1.{name}.2", h1p["local"][name]["TorchBatchNorm_0"],
               h1s["local"][name]["TorchBatchNorm_0"])
    for i in range(1, 5):
        sd[f"h_net1.upsample{i}.1.weight"] = conv(
            h1p[f"upsample{i}"]["Conv3x3_0"]["Conv_0"]["kernel"])
        put_bn(f"h_net1.upsample{i}.2",
               h1p[f"upsample{i}"]["TorchBatchNorm_0"],
               h1s[f"upsample{i}"]["TorchBatchNorm_0"])

    for b in range(2, CFG.branch_num + 1):
        hbp, hbs = p[f"h_net{b}"], s[f"h_net{b}"]
        k = hbp["att"]["conv_context"]["kernel"]
        sd[f"h_net{b}.att.conv_context.weight"] = rng.randn(
            k.shape[1], k.shape[0], 1, 1).astype("f")
        for i in range(CFG.r_num):
            rb = hbp[f"residual{i}"]
            sd[f"h_net{b}.residual.{i}.block.0.weight"] = conv(
                rb["Conv3x3_0"]["Conv_0"]["kernel"])
            sd[f"h_net{b}.residual.{i}.block.3.weight"] = conv(
                rb["Conv3x3_1"]["Conv_0"]["kernel"])
            put_bn(f"h_net{b}.residual.{i}.block.1",
                   rb["TorchBatchNorm_0"], hbs[f"residual{i}"]["TorchBatchNorm_0"])
            put_bn(f"h_net{b}.residual.{i}.block.4",
                   rb["TorchBatchNorm_1"], hbs[f"residual{i}"]["TorchBatchNorm_1"])
        sd[f"h_net{b}.upsample.1.weight"] = conv(
            hbp["upsample"]["Conv3x3_0"]["Conv_0"]["kernel"])
        put_bn(f"h_net{b}.upsample.2", hbp["upsample"]["TorchBatchNorm_0"],
               hbs["upsample"]["TorchBatchNorm_0"])
    for b in range(1, CFG.branch_num + 1):
        sd[f"img_net{b}.img.0.weight"] = conv(
            p[f"img_net{b}"]["img"]["Conv_0"]["kernel"])
    return sd


def test_attngan_g_import_structure_and_values():
    g, variables = _flax_variables()
    sd = _torch_sd_from_flax(variables["params"], variables["batch_stats"])
    params, stats = import_attngan_g({"netG": sd},
                                     branch_num=CFG.branch_num,
                                     r_num=CFG.r_num)
    want = jax.tree.structure({"p": variables["params"],
                               "s": variables["batch_stats"]})
    got = jax.tree.structure({"p": params, "s": stats})
    assert got == want, f"importer structure mismatch:\n{got}\nvs\n{want}"
    # conv transpose correctness: OIHW -> HWIO
    np.testing.assert_allclose(
        params["img_net1"]["img"]["Conv_0"]["kernel"],
        np.transpose(sd["img_net1.img.0.weight"], (2, 3, 1, 0)))
    # linear transpose
    np.testing.assert_allclose(
        params["h_net1"]["fc"]["kernel"], sd["h_net1.fc.0.weight"].T)
    # imported weights actually run
    out = g.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((2, CFG.z_dim)),
                  jnp.zeros((2, CFG.embedding_dim)),
                  jnp.zeros((2, T, CFG.embedding_dim)),
                  jnp.zeros((2, T), bool),
                  jnp.tile(jnp.array([0.25, 0.25, 0.5, 0.5]), (2, 3, 1)),
                  jnp.zeros((2, 3, 81)).at[:, :, 0].set(1.0),
                  train=False, ca_rng=None)
    assert out["imgs"][0].shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(out["imgs"][-1])).all()
