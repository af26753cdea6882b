"""Full-width checkpoint interop (slow, CPU).

The value-parity suite runs at reduced width (tests/test_torch_parity.py
gf_dim=8); width-dependent importer/exporter reshape bugs at the
reference's production widths (mnist GF_DIM=128 -> ngf 1024,
code/multi-mnist/cfg/mnist_train.yml; attngan GF_DIM=48,
code/coco/attngan/cfg/coco_train.yml) previously relied on manual TPU
drives. These tests round-trip a full-width random reference-format .pth
through import -> forward -> export -> re-import and assert torch-forward
parity, sd-space identity, and re-import identity — at small batch so the
cost is compile-bound, not FLOP-bound.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multiple_objects_gan_tpu.io import torch_export as tx  # noqa: E402
from multiple_objects_gan_tpu.io import torch_import as ti  # noqa: E402
from multiple_objects_gan_tpu.models import common  # noqa: E402
from multiple_objects_gan_tpu.models.attngan import COCO_ATTN, GNet  # noqa: E402
from multiple_objects_gan_tpu.models.stage1 import Stage1G  # noqa: E402
from multiple_objects_gan_tpu.ops import (  # noqa: E402
    transformation_matrix_inverse,
)

import test_attngan_parity as ap  # noqa: E402
import test_torch_parity as tp  # noqa: E402
from test_torch_export import (  # noqa: E402
    DEAD_LABEL_KEYS,
    _assert_sd_roundtrip,
    _np_sd,
)

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _highest_matmul_precision():
    """CPU's default matmul/conv precision is bf16-ish (oneDNN — see
    CLAUDE.md); at full width (768-1024 channel reductions) that noise
    reaches ~1e-2 and would mask real importer bugs. Forward parity here
    is a numerical claim, so run the whole test at HIGHEST."""
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", prev)


def _assert_params_identical(a: dict, b: dict, label: str):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb) and la, label
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=label)


def test_mnist_fullwidth_pth_roundtrip(monkeypatch):
    """mnist STAGE1_G at GF_DIM=128 (ngf=1024, the mnist_train.yml width):
    torch forward == flax forward through the importer, export reproduces
    the .pth exactly, re-import reproduces the params exactly."""
    monkeypatch.setattr(tp, "MCFG", common.MNIST)     # gf_dim=128, full
    monkeypatch.setattr(tp, "NGF", common.MNIST.ngf)  # 1024
    mcfg = common.MNIST

    tg = tp._randomize(tp.Stage1GTorch(), seed=77)
    tg.eval()

    rng = np.random.RandomState(4)
    b = 2
    z = rng.randn(b, mcfg.z_dim).astype(np.float32)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3))], -1).astype(np.float32)
    onehot = np.zeros((b, 3, 10), np.float32)
    for i in range(b):
        for j in range(3):
            onehot[i, j, rng.randint(10)] = 1.0
    theta = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        want = tg(torch.from_numpy(z), torch.from_numpy(theta),
                  torch.from_numpy(onehot)).numpy()

    sd = _np_sd(tg)
    params, stats = ti.import_stage1_g({"netG": sd}, mcfg)

    g = Stage1G(mcfg)
    out = jax.jit(lambda p, s: g.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(z), jnp.asarray(bbox),
        jnp.asarray(onehot), None, train=False, ca_rng=None))(params, stats)
    got = np.asarray(out["img"]).transpose(0, 3, 1, 2)
    # wider than the gf_dim=8 parity tolerance (2e-4): at ngf=1024 the
    # 9*512-wide conv reductions accumulate more fp noise
    np.testing.assert_allclose(got, want, atol=1e-3)

    exported = tx.export_stage1_g(params, stats, mcfg)
    _assert_sd_roundtrip(sd, exported, allowed_extra=DEAD_LABEL_KEYS)

    params2, stats2 = ti.import_stage1_g({"netG": exported}, mcfg)
    _assert_params_identical(params, params2, "params after re-import")
    _assert_params_identical(stats, stats2, "stats after re-import")


def test_attngan_fullwidth_g_roundtrip(monkeypatch):
    """attngan G_NET at GF_DIM=48 / EMBEDDING_DIM=256 / CONDITION_DIM=100
    (the coco_attn_train.yml widths; branch 2 — branch 3 repeats the
    h_net2 structure): same three assertions as the mnist test."""
    import dataclasses

    full = dataclasses.replace(COCO_ATTN, gf_dim=48, df_dim=96,
                               condition_dim=100, embedding_dim=256,
                               z_dim=100, branch_num=2, r_num=1)
    monkeypatch.setattr(ap, "CFG", full)

    tg = ap._randomize(ap.AttnGNetTorch(), seed=13)
    tg.eval()

    rng = np.random.RandomState(2)
    b = 2
    T = ap.T
    NO = ap.NO
    z = rng.randn(b, full.z_dim).astype(np.float32)
    sent = rng.randn(b, full.embedding_dim).astype(np.float32)
    words = rng.randn(b, full.embedding_dim, T).astype(np.float32)
    # identical pad PATTERN across the batch: the torch replica mirrors
    # the upstream GlobalAttention mask-misalignment bug (it pairs row i
    # with batch (i % b)'s mask — PARITY.md deviation #3, fixed in
    # nn/attention.py), so differing per-row masks would diverge BY
    # DESIGN at b > 1; equal masks make the misalignment a no-op while
    # the width mapping is still fully exercised
    caps = np.array([[3, 5, 2, 0, 0], [1, 4, 2, 0, 0]], np.int32)
    mask = caps == 0
    bbox = np.stack([rng.uniform(0.1, 0.5, (b, NO)),
                     rng.uniform(0.1, 0.5, (b, NO)),
                     rng.uniform(0.2, 0.4, (b, NO)),
                     rng.uniform(0.2, 0.4, (b, NO))], -1).astype(np.float32)
    onehot = np.zeros((b, NO, 81), np.float32)
    for i in range(b):
        for j in range(NO):
            onehot[i, j, rng.randint(81)] = 1.0
    t_inv = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))

    with torch.no_grad():
        w1, w2 = tg(torch.from_numpy(z), torch.from_numpy(sent),
                    torch.from_numpy(words), torch.from_numpy(mask),
                    torch.from_numpy(t_inv), torch.from_numpy(onehot))
    want1, want2 = w1.numpy(), w2.numpy()

    sd = _np_sd(tg)
    params, stats = ti.import_attngan_g({"netG": sd}, branch_num=2, r_num=1)

    g = GNet(full)
    out = jax.jit(lambda p, s: g.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(z), jnp.asarray(sent),
        jnp.asarray(words.transpose(0, 2, 1)), jnp.asarray(mask),
        jnp.asarray(bbox), jnp.asarray(onehot), train=False,
        ca_rng=None))(params, stats)
    got1 = np.asarray(out["imgs"][0]).transpose(0, 3, 1, 2)
    got2 = np.asarray(out["imgs"][1]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got1, want1, atol=1e-3)
    np.testing.assert_allclose(got2, want2, atol=1e-3)

    exported = tx.export_attngan_g(params, stats, branch_num=2, r_num=1)
    _assert_sd_roundtrip(sd, exported)

    params2, stats2 = ti.import_attngan_g({"netG": exported},
                                          branch_num=2, r_num=1)
    _assert_params_identical(params, params2, "params after re-import")
    _assert_params_identical(stats, stats2, "stats after re-import")
