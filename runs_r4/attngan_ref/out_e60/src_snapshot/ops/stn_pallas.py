"""Fused Pallas TPU kernel for the multi-object STN place-and-accumulate.

The hot op of every G/D forward is ``stn_place_multi``: for each (batch,
object) pair, resample an (h, w, C) feature map through two 1-D bilinear
weight matrices and accumulate over objects (ops/stn.py). The XLA path runs
it as three kernels (weight build, two batched matmuls, reduction); this
Pallas kernel fuses weight computation + both matmuls + the object-sum into
one VMEM-resident pass per batch element — no HBM round-trips for the
intermediates.

API-compatible with :func:`multiple_objects_gan_tpu.ops.stn_place_multi`
(same math, same zero-padding semantics); A/B-tested in
tests/test_stn_pallas.py. Grid: one program per batch element; the object
loop is unrolled inside the kernel (O is static and small: 3-4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _axis_weights_in_kernel(scale, trans, out_size: int, in_size: int):
    """W[i, j] = max(0, 1 - |src_i - j|) built from broadcasted iota.

    Mosaic only supports integer iota; build int32 and cast."""
    i = jax.lax.broadcasted_iota(jnp.int32, (out_size, in_size), 0
                                 ).astype(jnp.float32)
    j = jax.lax.broadcasted_iota(jnp.int32, (out_size, in_size), 1
                                 ).astype(jnp.float32)
    g = -1.0 + i * (2.0 / (out_size - 1))          # linspace(-1, 1, out)
    src = (scale * g + trans + 1.0) * 0.5 * (in_size - 1)
    return jnp.maximum(1.0 - jnp.abs(src - j), 0.0)


def _place_kernel(bbox_ref, feat_ref, out_ref, *, n_objects: int,
                  out_hw: tuple[int, int]):
    ho, wo = out_hw
    _, _, hi, wi, c = feat_ref.shape
    acc = jnp.zeros((ho, wo, c), jnp.float32)
    for o in range(n_objects):
        x = bbox_ref[0, o, 0]
        y = bbox_ref[0, o, 1]
        w = bbox_ref[0, o, 2]
        h = bbox_ref[0, o, 3]
        sx = 1.0 / w
        sy = 1.0 / h
        tx = 2.0 * sx * (0.5 - (x + 0.5 * w))
        ty = 2.0 * sy * (0.5 - (y + 0.5 * h))
        wy = _axis_weights_in_kernel(sy, ty, ho, hi)     # (Ho, hi)
        wx = _axis_weights_in_kernel(sx, tx, wo, wi)     # (Wo, wi)
        f = feat_ref[0, o].astype(jnp.float32)           # (hi, wi, C)
        # HIGHEST precision: default lowers f32 matmuls to bf16 passes,
        # which drifts ~3e-3 off the XLA/torch-parity path
        hp = jax.lax.Precision.HIGHEST
        tmp = jax.lax.dot_general(                        # (Ho, wi*C)
            wy, f.reshape(hi, wi * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32)
        tmp = tmp.reshape(ho, wi, c)
        out = jax.lax.dot_general(                        # rows x (Wo, wi)
            wx, tmp.reshape(ho * 1, wi, c).transpose(1, 0, 2).reshape(
                wi, ho * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32)  # (Wo, Ho*C)
        out = out.reshape(wo, ho, c).transpose(1, 0, 2)   # (Ho, Wo, C)
        acc = acc + out
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def stn_place_multi_pallas(features: Array, bbox: Array,
                           out_hw: tuple[int, int] = (16, 16)) -> Array:
    """features (B, O, h, w, C), bbox (B, O, 4) -> (B, Ho, Wo, C)."""
    b, o, hi, wi, c = features.shape
    ho, wo = out_hw
    kernel = functools.partial(_place_kernel, n_objects=o, out_hw=out_hw)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, o, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, o, hi, wi, c), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c), features.dtype),
    )(bbox, features)


def _place_grad_kernel(bbox_ref, g_ref, out_ref, *, n_objects: int,
                       in_hw: tuple[int, int]):
    """Backward of the place: df[o] = Wy^T @ g @ Wx with the SAME weight
    matrices as the forward (an extract-shaped pass, but using the exact
    transposes — not freshly derived extract weights)."""
    hi, wi = in_hw
    _, ho, wo, c = g_ref.shape
    g = g_ref[0].astype(jnp.float32)                      # (Ho, Wo, C)
    hp = jax.lax.Precision.HIGHEST
    for o in range(n_objects):
        x = bbox_ref[0, o, 0]
        y = bbox_ref[0, o, 1]
        w = bbox_ref[0, o, 2]
        h = bbox_ref[0, o, 3]
        sx = 1.0 / w
        sy = 1.0 / h
        tx = 2.0 * sx * (0.5 - (x + 0.5 * w))
        ty = 2.0 * sy * (0.5 - (y + 0.5 * h))
        wy = _axis_weights_in_kernel(sy, ty, ho, hi)      # (Ho, hi)
        wx = _axis_weights_in_kernel(sx, tx, wo, wi)      # (Wo, wi)
        # t1[p, j, c] = sum_i Wy[i, p] g[i, j, c]
        t1 = jax.lax.dot_general(
            wy, g.reshape(ho, wo * c),
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32)  # (hi, Wo*C)
        t1 = t1.reshape(hi, wo, c)
        # df[p, q, c] = sum_j t1[p, j, c] Wx[j, q]
        df = jax.lax.dot_general(
            wx, t1.transpose(1, 0, 2).reshape(wo, hi * c),
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=hp, preferred_element_type=jnp.float32)  # (wi, hi*C)
        df = df.reshape(wi, hi, c).transpose(1, 0, 2)     # (hi, wi, C)
        out_ref[0, o] = df.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("in_hw",))
def stn_place_multi_grad_pallas(g: Array, bbox: Array,
                                in_hw: tuple[int, int]) -> Array:
    """g (B, Ho, Wo, C), bbox (B, O, 4) -> df (B, O, h, w, C)."""
    b, ho, wo, c = g.shape
    o = bbox.shape[1]
    hi, wi = in_hw
    kernel = functools.partial(_place_grad_kernel, n_objects=o, in_hw=in_hw)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, o, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, o, hi, wi, c), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, o, hi, wi, c), g.dtype),
    )(bbox, g)


# --- differentiable fused entry point (used by ops.stn_place_multi on TPU) --

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused(features: Array, bbox: Array, out_hw: tuple[int, int],
           in_hw: tuple[int, int]) -> Array:
    return stn_place_multi_pallas(features, bbox, out_hw)


def _fused_fwd(features, bbox, out_hw, in_hw):
    return stn_place_multi_pallas(features, bbox, out_hw), bbox


def _fused_bwd(out_hw, in_hw, bbox, g):
    df = stn_place_multi_grad_pallas(g, bbox, in_hw)
    return df, jnp.zeros_like(bbox)


_fused.defvjp(_fused_fwd, _fused_bwd)


def stn_place_multi_fused(features: Array, bbox: Array,
                          out_hw: tuple[int, int] = (16, 16)) -> Array:
    """Differentiable fused place-and-accumulate. Gradients flow to
    ``features`` only; bbox comes from data in every model (the reference
    never backprops through the matrices either)."""
    return _fused(features, bbox, tuple(out_hw),
                  (features.shape[2], features.shape[3]))
