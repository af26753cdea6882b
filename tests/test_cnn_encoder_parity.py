"""CNN_ENCODER (DAMSM Inception-v3 image encoder) value parity vs torch.

Oracle: a test-only modern-torch replica of the reference CNN_ENCODER
(code/coco/attngan/model.py:207-313), which wraps torchvision's
inception_v3 backbone up to Mixed_7c plus emb_features/emb_cnn_code heads.
Module names match torchvision so the replica's state_dict has exactly the
key set of the published image_encoder .pth files — the same keys
io/damsm_import.import_image_encoder consumes. Inputs are fed at 299x299
so both stacks' internal resize is the identity and the comparison
isolates the conv/BN arithmetic.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch oracle (mirrors torchvision inception_v3 blocks; test-only)
# ---------------------------------------------------------------------------

class BasicConv2d(tnn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class IncA(tnn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class IncB(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class IncC(tnn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class IncD(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class IncE(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch1x1 = BasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class CNNEncoderTorch(tnn.Module):
    """Reference CNN_ENCODER (model.py:207-313) without the input resize."""

    def __init__(self, nef=32):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280)
        self.Mixed_7c = IncE(2048)
        self.emb_features = tnn.Conv2d(768, nef, kernel_size=1, bias=False)
        self.emb_cnn_code = tnn.Linear(2048, nef)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        features = x                                   # (B, 768, 17, 17)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        x = F.avg_pool2d(x, kernel_size=8)
        pool = x.view(x.size(0), -1)                   # (B, 2048)
        cnn_code = self.emb_cnn_code(pool)
        region = self.emb_features(features)           # (B, nef, 17, 17)
        return region, cnn_code, pool


def _randomize(model, seed=0):
    """Random but well-conditioned weights incl. BN running stats."""
    rng = np.random.RandomState(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        a = v.numpy()
        if k.endswith("running_var"):
            sd[k] = torch.from_numpy(
                rng.uniform(0.5, 1.5, a.shape).astype(np.float32))
        elif k.endswith("running_mean"):
            sd[k] = torch.from_numpy(
                (rng.randn(*a.shape) * 0.1).astype(np.float32))
        elif k.endswith("num_batches_tracked"):
            continue
        elif ".bn.weight" in k:
            sd[k] = torch.from_numpy(
                rng.uniform(0.5, 1.5, a.shape).astype(np.float32))
        elif ".bn.bias" in k or k.endswith("emb_cnn_code.bias"):
            sd[k] = torch.from_numpy(
                (rng.randn(*a.shape) * 0.1).astype(np.float32))
        else:
            sd[k] = torch.from_numpy(
                (rng.randn(*a.shape) * 0.05).astype(np.float32))
    model.load_state_dict(sd)
    return model


@pytest.mark.parametrize("nef", [32])
def test_cnn_encoder_value_parity_via_importer(tmp_path, nef):
    from multiple_objects_gan_tpu.io.damsm_import import import_image_encoder
    from multiple_objects_gan_tpu.nn.encoders import CNNEncoder

    torch.manual_seed(0)
    oracle = _randomize(CNNEncoderTorch(nef=nef)).eval()
    pth = tmp_path / "image_encoder_test.pth"
    torch.save(oracle.state_dict(), pth)

    rng = np.random.RandomState(42)
    x = rng.randn(2, 299, 299, 3).astype(np.float32) * 0.5

    with torch.no_grad():
        t_region, t_code, t_pool = oracle(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    t_region = np.transpose(t_region.numpy(), (0, 2, 3, 1))

    enc = CNNEncoder(nef=nef)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)),
                         train=False)
    variables = import_image_encoder(str(pth), variables)
    with jax.default_matmul_precision("float32"):
        j_region, j_code, j_pool = enc.apply(variables, jnp.asarray(x),
                                             train=False, return_pool=True)

    # ~94 conv layers deep: allow small f32 accumulation drift
    np.testing.assert_allclose(np.asarray(j_pool), t_pool.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(j_code), t_code.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(j_region), t_region,
                               atol=2e-3, rtol=2e-3)
