"""Canonical pytorch-fid Inception-v3 (pool3 features) for published-number
FID comparability.

Published FID numbers for the reference (BASELINE.md "COCO-256px FID
parity"; eval context /root/reference/index.md:203) are computed with
pytorch-fid's port of the TF 2015 Inception — different weights AND
slightly different modules than the torchvision backbone behind the DAMSM
image encoder (nn/encoders.py). The deltas, mirrored exactly here:

  * every stride-1 3x3 avg-pool branch (InceptionA/C and Mixed_7b's
    InceptionE) uses ``count_include_pad=False`` — border averages divide
    by the number of REAL elements, not 9;
  * Mixed_7c's (second InceptionE) pool branch is a MAX pool, not avg;
  * weights come from pt_inception-2015-12-05 (a 1008-class fc, unused —
    FID reads the 2048-d pool3).

Everything is pinned f32 AND ``Precision.HIGHEST``
(``BasicConv2d(dtype=jnp.float32, precision=HIGHEST)``, including the
reused Mixed_6a/Mixed_7a blocks) so the metric never depends on the
--bf16 training knob or the backend's default (bf16-ish) matmul
precision — CLAUDE.md's parity rule. Input follows the repo
model-image convention, [-1, 1] NHWC at any size; the internal bilinear
resize to 299 (half-pixel centers == torch align_corners=False) commutes
with pytorch-fid's [0,1]-resize-then-normalize because both maps are
linear.

Weights import via :func:`import_fid_inception` from either the
pt_inception .pth or a torchvision inception_v3 state_dict (same key
schema); coverage is checked — a key that maps nowhere or a leaf left
random raises instead of silently corrupting the metric.
"""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multiple_objects_gan_tpu.nn.encoders import (
    BasicConv2d, InceptionB, InceptionD, _max_pool3_s2)

Array = jax.Array

_F32 = {"dtype": jnp.float32, "precision": jax.lax.Precision.HIGHEST}


def _avg_pool3_nopad_count(x: Array) -> Array:
    """3x3 stride-1 pad-1 average pool with count_include_pad=False:
    divide each window sum by the count of real (non-pad) elements.
    The count mask depends only on the static shape — XLA constant-folds
    it, so this costs one elementwise divide over the plain pool."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    count = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return summed / count


def _max_pool3_s1(x: Array) -> Array:
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class FIDInceptionA(nn.Module):
    """torchvision InceptionA with the pytorch-fid avg-pool patch."""

    pool_features: int

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", **_F32)(x, train)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", **_F32)(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2",
                         **_F32)(b5, train)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", **_F32)(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2",
                         **_F32)(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3",
                         **_F32)(b3, train)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool",
                         **_F32)(_avg_pool3_nopad_count(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class FIDInceptionC(nn.Module):
    """torchvision InceptionC with the pytorch-fid avg-pool patch."""

    c7: int

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", **_F32)(x, train)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", **_F32)(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2",
                         **_F32)(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3",
                         **_F32)(b7, train)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", **_F32)(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2",
                         **_F32)(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3",
                         **_F32)(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4",
                         **_F32)(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5",
                         **_F32)(bd, train)
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         **_F32)(_avg_pool3_nopad_count(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class FIDInceptionE(nn.Module):
    """torchvision InceptionE with a configurable pool branch:
    Mixed_7b uses the count_include_pad=False avg pool, Mixed_7c a max
    pool (pytorch-fid's FIDInceptionE_1 / FIDInceptionE_2)."""

    pool: str  # "avg_nopad" | "max"

    @nn.compact
    def __call__(self, x, train=False):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", **_F32)(x, train)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", **_F32)(x, train)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a",
                          **_F32)(b3, train)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b",
                          **_F32)(b3, train)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1", **_F32)(x, train)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2",
                         **_F32)(bd, train)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a",
                          **_F32)(bd, train)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b",
                          **_F32)(bd, train)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        pooled = (_max_pool3_s1(x) if self.pool == "max"
                  else _avg_pool3_nopad_count(x))
        bp = BasicConv2d(192, (1, 1), name="branch_pool",
                         **_F32)(pooled, train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """pytorch-fid InceptionV3 up to pool3.

    (B, H, W, 3) images in [-1, 1] -> (B, 2048) f32 pool3 features.
    ``return_pool``/3-tuple shape matches CNNEncoder's interface so
    utils.metrics.inception_activations drives either encoder.
    """

    @nn.compact
    def __call__(self, x: Array, train: bool = False,
                 return_pool: bool = True):
        b = x.shape[0]
        x = x.astype(jnp.float32)
        # antialias=False: pytorch-fid's F.interpolate(bilinear,
        # align_corners=False) never low-pass-filters, even downscaling
        x = jax.image.resize(x, (b, 299, 299, x.shape[-1]),
                             method="bilinear", antialias=False)
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3",
                        **_F32)(x, train)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", **_F32)(x, train)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3",
                        **_F32)(x, train)
        x = _max_pool3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", **_F32)(x, train)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", **_F32)(x, train)
        x = _max_pool3_s2(x)
        x = FIDInceptionA(32, name="Mixed_5b")(x, train)
        x = FIDInceptionA(64, name="Mixed_5c")(x, train)
        x = FIDInceptionA(64, name="Mixed_5d")(x, train)
        x = InceptionB(name="Mixed_6a", **_F32)(x, train)
        x = FIDInceptionC(128, name="Mixed_6b")(x, train)
        x = FIDInceptionC(160, name="Mixed_6c")(x, train)
        x = FIDInceptionC(160, name="Mixed_6d")(x, train)
        x = FIDInceptionC(192, name="Mixed_6e")(x, train)
        x = InceptionD(name="Mixed_7a", **_F32)(x, train)
        x = FIDInceptionE("avg_nopad", name="Mixed_7b")(x, train)
        x = FIDInceptionE("max", name="Mixed_7c")(x, train)
        pool = jnp.mean(x, axis=(1, 2))               # adaptive avg -> (1,1)
        if return_pool:
            return None, None, pool
        return pool


def import_fid_inception(path: str, variables: dict) -> dict:
    """Map a pt_inception / torchvision inception_v3 state_dict onto
    FIDInceptionV3 variables, with full coverage checking."""
    from multiple_objects_gan_tpu.io.damsm_import import _load_sd, _set

    sd = _load_sd(path)
    params = copy.deepcopy(dict(variables["params"]))
    stats = copy.deepcopy(dict(variables["batch_stats"]))
    seen: set = set()

    def _assign(tree, parts, leaf, val):
        # shape check against the initialized leaf before overwriting
        node = tree
        for p in parts:
            node = node[p]
        if tuple(node[leaf].shape) != tuple(val.shape):
            raise ValueError(f"{'.'.join(parts + [leaf])}: shape "
                             f"{val.shape} != expected {node[leaf].shape}")
        _set(tree, parts + [leaf], val)
        seen.add((id(tree), tuple(parts + [leaf])))

    for key, val in sd.items():
        if (key.startswith(("AuxLogits.", "fc."))
                or key.endswith("num_batches_tracked")):
            continue
        parts = key.split(".")
        val = np.asarray(val, np.float32)
        if parts[-2] == "conv" and parts[-1] == "weight":
            _assign(params, parts[:-1], "kernel",
                    np.transpose(val, (2, 3, 1, 0)))
        elif parts[-2] == "bn" and parts[-1] in ("weight", "bias"):
            _assign(params, parts[:-1],
                    {"weight": "scale", "bias": "bias"}[parts[-1]], val)
        elif parts[-2] == "bn" and parts[-1] == "running_mean":
            _assign(stats, parts[:-1], "mean", val)
        elif parts[-2] == "bn" and parts[-1] == "running_var":
            _assign(stats, parts[:-1], "var", val)
        else:
            raise KeyError(f"unmapped FID-inception state-dict key: {key}")

    def _leaves(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from _leaves(v, prefix + (k,))
            else:
                yield prefix + (k,)

    missing = [".".join(p) for tree in (params, stats)
               for p in _leaves(tree) if (id(tree), p) not in seen]
    if missing:
        raise KeyError(f"FID-inception import left {len(missing)} leaves "
                       f"uninitialized (file {path!r} incomplete?): "
                       f"{missing[:5]}")
    return {"params": params, "batch_stats": stats}


def create_fid_encoder(weights_path: str):
    """Build FIDInceptionV3 + imported variables. Returns (module, vars)."""
    module = FIDInceptionV3()
    init = jax.jit(module.init, static_argnames=("train",))
    variables = init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)),
                     train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return module, import_fid_inception(weights_path, dict(variables))
