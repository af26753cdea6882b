"""Canonical pytorch-fid Inception encoder: value parity vs a torch oracle.

Oracle: a test-only modern-torch replica of pytorch-fid's InceptionV3
(the patched blocks FIDInceptionA/C/E_1/E_2 — avg-pool
count_include_pad=False, Mixed_7c max pool), built from the plain
torchvision-block replicas in test_cnn_encoder_parity.py. Random but
well-conditioned weights; the state_dict has the key schema of the
published pt_inception-2015-12-05 .pth (incl. dummy AuxLogits/fc entries
that the importer must skip). Inputs are fed at 299x299 so the internal
resize is the identity and the comparison isolates the arithmetic.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax
import jax.numpy as jnp

from test_cnn_encoder_parity import (
    BasicConv2d as TBasicConv2d, IncB, IncD, IncE, _randomize)


# ---------------------------------------------------------------------------
# torch oracle: pytorch-fid patched blocks
# ---------------------------------------------------------------------------

class FIDIncA(tnn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1,
                                           count_include_pad=False))
        return torch.cat([b1, b5, bd, bp], 1)


class FIDIncC(tnn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1,
                                           count_include_pad=False))
        return torch.cat([b1, b7, bd, bp], 1)


class FIDIncE(IncE):
    """InceptionE with pytorch-fid's pool branch (avg exclude-pad for
    Mixed_7b, max for Mixed_7c)."""

    def __init__(self, in_ch, pool):
        super().__init__(in_ch)
        self._pool = pool

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        if self._pool == "max":
            pooled = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            pooled = F.avg_pool2d(x, 3, stride=1, padding=1,
                                  count_include_pad=False)
        bp = self.branch_pool(pooled)
        return torch.cat([b1, b3, bd, bp], 1)


class FIDInceptionTorch(tnn.Module):
    """pytorch-fid InceptionV3 up to pool3, no input resize."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = FIDIncA(192, 32)
        self.Mixed_5c = FIDIncA(256, 64)
        self.Mixed_5d = FIDIncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = FIDIncC(768, 128)
        self.Mixed_6c = FIDIncC(768, 160)
        self.Mixed_6d = FIDIncC(768, 160)
        self.Mixed_6e = FIDIncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = FIDIncE(1280, "avg_nopad")
        self.Mixed_7c = FIDIncE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        x = F.adaptive_avg_pool2d(x, (1, 1))
        return x.view(x.size(0), -1)                   # (B, 2048)


def _save_sd_with_head_keys(oracle, path):
    """state_dict + dummy fc/AuxLogits keys (present in the published
    pt_inception .pth; the importer must skip them)."""
    sd = oracle.state_dict()
    sd["fc.weight"] = torch.zeros(1008, 2048)
    sd["fc.bias"] = torch.zeros(1008)
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    sd["AuxLogits.conv0.bn.weight"] = torch.zeros(128)
    torch.save(sd, path)


@pytest.fixture(scope="module")
def oracle_and_pth(tmp_path_factory):
    torch.manual_seed(0)
    oracle = _randomize(FIDInceptionTorch(), seed=11).eval()
    pth = tmp_path_factory.mktemp("fid") / "pt_inception_test.pth"
    _save_sd_with_head_keys(oracle, str(pth))
    return oracle, str(pth)


def test_fid_inception_pool3_parity(oracle_and_pth, monkeypatch):
    """Parity must hold with NO external precision context and with the
    global --bf16 knob set: the module pins f32 + Precision.HIGHEST
    internally (incl. the reused Mixed_6a/Mixed_7a blocks), so published-
    number comparability never depends on caller-side configuration."""
    from multiple_objects_gan_tpu.nn import blocks
    from multiple_objects_gan_tpu.nn.fid_inception import create_fid_encoder

    oracle, pth = oracle_and_pth
    rng = np.random.RandomState(7)
    x = rng.randn(2, 299, 299, 3).astype(np.float32) * 0.5

    with torch.no_grad():
        t_pool = oracle(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()

    module, variables = create_fid_encoder(pth)
    # adversarial global knob: a fresh jit traces under bf16 COMPUTE_DTYPE
    monkeypatch.setattr(blocks, "COMPUTE_DTYPE", jnp.bfloat16)
    fwd = jax.jit(lambda v, xb: module.apply(v, xb, train=False,
                                             return_pool=True)[2])
    j_pool = np.asarray(fwd(variables, jnp.asarray(x)), np.float32)

    assert j_pool.shape == (2, 2048)
    assert j_pool.dtype == np.float32
    # ~94 conv layers deep: allow small f32 accumulation drift
    np.testing.assert_allclose(j_pool, t_pool, atol=2e-3, rtol=2e-3)


def test_fid_import_coverage_check(tmp_path, oracle_and_pth):
    """A state_dict missing a module must raise, not silently leave that
    leaf random (that would corrupt the metric undetectably)."""
    from multiple_objects_gan_tpu.nn.fid_inception import (
        FIDInceptionV3, import_fid_inception)

    oracle, _ = oracle_and_pth
    sd = {k: v for k, v in oracle.state_dict().items()
          if not k.startswith("Mixed_7c.")}
    bad = tmp_path / "incomplete.pth"
    torch.save(sd, str(bad))

    module = FIDInceptionV3()
    variables = jax.jit(module.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)), train=False)
    with pytest.raises(KeyError, match="uninitialized"):
        import_fid_inception(str(bad), dict(variables))


def test_fid_import_rejects_unknown_keys(tmp_path, oracle_and_pth):
    from multiple_objects_gan_tpu.nn.fid_inception import (
        FIDInceptionV3, import_fid_inception)

    oracle, _ = oracle_and_pth
    sd = oracle.state_dict()
    sd["Mixed_9z.branch1x1.conv.weight"] = torch.zeros(8, 8, 1, 1)
    bad = tmp_path / "unknown.pth"
    torch.save(sd, str(bad))
    module = FIDInceptionV3()
    variables = jax.jit(module.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)), train=False)
    with pytest.raises(KeyError):
        import_fid_inception(str(bad), dict(variables))


def test_resolve_fid_encoder_provenance(oracle_and_pth, monkeypatch):
    from multiple_objects_gan_tpu.utils.metrics import resolve_fid_encoder

    _, pth = oracle_and_pth
    monkeypatch.setenv("FID_INCEPTION_WEIGHTS", pth)
    enc, variables, prov = resolve_fid_encoder(None, None)
    assert prov == "fid_canonical"
    assert enc is not None

    monkeypatch.delenv("FID_INCEPTION_WEIGHTS")
    sentinel_mod, sentinel_vars = object(), object()
    enc, variables, prov = resolve_fid_encoder(sentinel_mod, sentinel_vars,
                                               provenance="damsm")
    assert (enc, variables, prov) == (sentinel_mod, sentinel_vars, "damsm")


def test_resize_matches_torch_interpolate():
    """The internal 299-resize must equal F.interpolate(bilinear,
    align_corners=False) for upscale AND downscale (no antialias)."""
    rng = np.random.RandomState(3)
    for size in (64, 340):
        x = rng.randn(1, size, size, 3).astype(np.float32)
        j = jax.image.resize(jnp.asarray(x), (1, 299, 299, 3),
                             method="bilinear", antialias=False)
        t = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                          size=(299, 299), mode="bilinear",
                          align_corners=False)
        np.testing.assert_allclose(
            np.asarray(j), np.transpose(t.numpy(), (0, 2, 3, 1)),
            atol=1e-5, rtol=1e-5)
