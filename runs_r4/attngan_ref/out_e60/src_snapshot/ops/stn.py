"""Spatial-transformer core ops (the reference's only "custom kernel" layer).

Reference behavior being matched (see /root/reference):
  * ``compute_transformation_matrix`` — code/multi-mnist/miscc/utils.py:36-51:
    bbox (x, y, w, h) in [0,1] -> 2x3 affine that EXTRACTS the bbox region of
    the input onto a canonical output grid (scale=(w,h), t=2((x+w/2)-0.5)).
  * ``compute_transformation_matrix_inverse`` — miscc/utils.py:18-33:
    affine that PLACES a canonical feature map into the bbox
    (scale=(1/w,1/h), t=2*scale*(0.5-(x+w/2))).
  * ``stn`` — code/multi-mnist/model.py:73-77: F.affine_grid + F.grid_sample
    with PyTorch-0.4 semantics: bilinear, zero padding, align_corners=True.

TPU-first design
----------------
Every transformation matrix the reference ever builds is AXIS-ALIGNED (pure
scale + translation, zero off-diagonals). Bilinear resampling under an
axis-aligned affine is separable:

    out[i, j] = sum_{p, q}  Wy[i, p] * img[p, q] * Wx[j, q]

with 1-D hat-function weight matrices ``W[i, j] = max(0, 1 - |src_i - j|)``.
That turns the per-pixel gather of ``grid_sample`` into two batched matmuls
that run on the MXU — no scatter/gather, no dynamic indexing, fully fusable
by XLA, and trivially differentiable. Zero padding falls out for free: source
coordinates outside the input produce all-zero weight rows, which is exactly
how the reference encodes "no object" (bbox = -1 padding).

A general gather-based ``grid_sample`` is also provided for parity testing
and for arbitrary (non-axis-aligned) matrices.

Layout: NHWC everywhere (TPU-native). All public functions are pure and
jit/vmap-safe with static output sizes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array


def _use_pallas() -> bool:
    """Optionally route stn_place_multi through the fused Pallas kernel
    (MOG_STN_PALLAS=1).

    Measured on TPU v5e (round 2, full mnist train step, batch 128, fixed
    bench): XLA separable path ~5395 img/s vs fused Pallas ~5340 img/s —
    the kernel wins per-call (1.9x) but loses ~1% at the step level
    because XLA's big batched einsum keeps the MXU busier than a
    per-batch-element grid of tiny matmuls. The XLA path is therefore the
    default everywhere; the kernel (with its custom_vjp backward) stays
    available for A/B on future hardware.
    """
    env = os.environ.get("MOG_STN_PALLAS", "0").lower()
    return env in ("1", "on", "true")


# ---------------------------------------------------------------------------
# bbox -> 2x3 affine matrices (parity: miscc/utils.py:18-51 in every variant)
# ---------------------------------------------------------------------------

def transformation_matrix(bbox: Array) -> Array:
    """bbox (..., 4) of (x, y, w, h) in [0, 1] -> (..., 2, 3) EXTRACT matrix.

    Maps the canonical output grid onto the bbox region of the source image,
    i.e. ``stn(img, transformation_matrix(b), hw)`` crops the bbox content.
    """
    x, y, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    t_x = 2.0 * ((x + 0.5 * w) - 0.5)
    t_y = 2.0 * ((y + 0.5 * h) - 0.5)
    zeros = jnp.zeros_like(x)
    row0 = jnp.stack([w, zeros, t_x], axis=-1)
    row1 = jnp.stack([zeros, h, t_y], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def transformation_matrix_inverse(bbox: Array) -> Array:
    """bbox (..., 4) -> (..., 2, 3) PLACE matrix (inverse of the above).

    ``stn(feat, transformation_matrix_inverse(b), hw)`` pastes ``feat`` into
    the bbox region of an ``hw`` canvas, zeros elsewhere.
    """
    x, y, w, h = bbox[..., 0], bbox[..., 1], bbox[..., 2], bbox[..., 3]
    scale_x = 1.0 / w
    scale_y = 1.0 / h
    t_x = 2.0 * scale_x * (0.5 - (x + 0.5 * w))
    t_y = 2.0 * scale_y * (0.5 - (y + 0.5 * h))
    zeros = jnp.zeros_like(x)
    row0 = jnp.stack([scale_x, zeros, t_x], axis=-1)
    row1 = jnp.stack([zeros, scale_y, t_y], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


# ---------------------------------------------------------------------------
# Separable bilinear resampling (the fast path used by every model)
# ---------------------------------------------------------------------------

def _axis_weights(scale: Array, trans: Array, out_size: int, in_size: int,
                  dtype=jnp.float32) -> Array:
    """1-D bilinear weight matrix for one axis.

    scale, trans: (B,) affine coefficients for this axis (normalized coords).
    Returns (B, out_size, in_size) with
      W[b, i, j] = max(0, 1 - |src(b, i) - j|)
    where src = ((scale * g_i + trans) + 1) / 2 * (in_size - 1) and
    g_i = linspace(-1, 1, out_size)  (align_corners=True semantics).
    Out-of-range sources yield all-zero rows -> zero padding.
    """
    g = jnp.linspace(-1.0, 1.0, out_size, dtype=dtype)  # (out,)
    src = (scale[:, None] * g[None, :] + trans[:, None] + 1.0) * 0.5 * (in_size - 1)
    j = jnp.arange(in_size, dtype=dtype)
    w = 1.0 - jnp.abs(src[:, :, None] - j[None, None, :])
    return jnp.maximum(w, 0.0)


def stn_separable(image: Array, theta: Array, out_hw: tuple[int, int]) -> Array:
    """Axis-aligned STN: (B, H, W, C), theta (B, 2, 3) -> (B, Ho, Wo, C).

    Requires theta[:, 0, 1] == theta[:, 1, 0] == 0 (true for every matrix the
    framework builds). Computed as two MXU matmuls instead of a gather.
    """
    ho, wo = out_hw
    b, hi, wi, _ = image.shape
    dt = jnp.float32
    wy = _axis_weights(theta[:, 1, 1].astype(dt), theta[:, 1, 2].astype(dt), ho, hi)
    wx = _axis_weights(theta[:, 0, 0].astype(dt), theta[:, 0, 2].astype(dt), wo, wi)
    if image.dtype == jnp.bfloat16:
        # Mixed-precision training path (dtype-driven: only reached when
        # the caller feeds bf16 activations): resample natively in bf16 —
        # the MXU accumulates in f32, so the only extra rounding is of the
        # hat weights. Keeps activations AND their cotangents bf16
        # end-to-end; the f32 round-trip here measurably dominated HBM
        # traffic of the bandwidth-bound train step. Parity-critical paths
        # (checkpoint import, FID eval) run f32 and take the branch below.
        tmp = jnp.einsum("bip,bpqc->biqc", wy.astype(image.dtype), image)
        return jnp.einsum("biqc,bjq->bijc", tmp, wx.astype(image.dtype))
    img = image.astype(dt)
    # HIGHEST precision: these matmuls define numerical parity with the
    # reference's grid_sample; bf16 MXU passes would drift FID. The matrices
    # are tiny (<=256 wide) so the f32 cost is negligible.
    hp = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("bip,bpqc->biqc", wy, img, precision=hp)   # rows
    out = jnp.einsum("biqc,bjq->bijc", tmp, wx, precision=hp)   # cols
    return out.astype(image.dtype)


def stn_place(features: Array, bbox: Array, out_hw: tuple[int, int]) -> Array:
    """Paste (B, h, w, C) features into bbox (B, 4) on an out_hw canvas."""
    return stn_separable(features, transformation_matrix_inverse(bbox), out_hw)


def stn_extract(image: Array, bbox: Array, out_hw: tuple[int, int]) -> Array:
    """Crop the bbox (B, 4) region of (B, H, W, C) to a canonical out_hw grid."""
    return stn_separable(image, transformation_matrix(bbox), out_hw)


def stn_place_multi(features: Array, bbox: Array, out_hw: tuple[int, int]) -> Array:
    """Batched-object place-and-accumulate.

    features: (B, O, h, w, C), bbox: (B, O, 4) -> (B, Ho, Wo, C), the sum of
    each object's placed feature map. Replaces the reference's unrolled
    per-object Python loop (model.py:162-169) with one batched op: the object
    axis folds into the matmul batch, then a single reduction.

    Dispatch: the XLA separable-matmul path below is the DEFAULT on every
    backend (a step-level A/B on TPU favored it — see ROADMAP); set
    MOG_STN_PALLAS=1 to opt into the fused Pallas kernel
    (ops/stn_pallas.py, custom_vjp with an exact-transpose backward).
    Forward math is identical either way. bbox is treated as
    NON-DIFFERENTIABLE data on both paths (its cotangent is zeroed here
    so the opt-in kernel — whose custom_vjp returns zero bbox grads —
    cannot silently change gradient semantics): bboxes come from the
    dataset in every model, exactly like the reference, which builds the
    transformation matrices outside the graph.
    """
    bbox = jax.lax.stop_gradient(bbox)
    if _use_pallas():
        from multiple_objects_gan_tpu.ops.stn_pallas import (
            stn_place_multi_fused)
        return stn_place_multi_fused(features, bbox, out_hw)
    return stn_place_multi_xla(features, bbox, out_hw)


def stn_place_multi_xla(features: Array, bbox: Array,
                        out_hw: tuple[int, int]) -> Array:
    """XLA separable-matmul path of :func:`stn_place_multi`."""
    b, o = features.shape[:2]
    flat = features.reshape((b * o,) + features.shape[2:])
    placed = stn_place(flat, bbox.reshape(b * o, 4), out_hw)
    return placed.reshape((b, o) + placed.shape[1:]).sum(axis=1)


def stn_place_const_multi(labels: Array, bbox: Array,
                          out_hw: tuple[int, int]) -> Array:
    """Paste spatially-constant label vectors into their bboxes and sum.

    labels: (B, O, C), bbox: (B, O, 4) -> (B, Ho, Wo, C).

    Replaces the reference BBOX_NET inner loop (model.py:99-110): tile the
    label to a constant map, STN-place it, accumulate. For a constant map the
    bilinear result factorizes into an outer product of the 1-D weight row
    sums, so no resampling matmul is needed at all:

        placed[i, j, c] = label[c] * sum_p Wy[i, p] * sum_q Wx[j, q]
    """
    b, o, c = labels.shape
    ho, wo = out_hw
    theta = transformation_matrix_inverse(bbox.reshape(b * o, 4))
    dt = jnp.float32
    # in_size=16 matches the reference's 16x16 tiled constant map; any size
    # >= 2 gives the same mask interior, and 16 keeps border weights identical.
    wy = _axis_weights(theta[:, 1, 1].astype(dt), theta[:, 1, 2].astype(dt), ho, 16)
    wx = _axis_weights(theta[:, 0, 0].astype(dt), theta[:, 0, 2].astype(dt), wo, 16)
    mask = wy.sum(-1)[:, :, None] * wx.sum(-1)[:, None, :]  # (B*O, Ho, Wo)
    mask = mask.reshape(b, o, ho, wo)
    if labels.dtype == jnp.bfloat16:
        # bf16 training path (see stn_separable): keep cotangents bf16
        return jnp.einsum("bohw,boc->bhwc", mask.astype(labels.dtype),
                          labels)
    out = jnp.einsum("bohw,boc->bhwc", mask, labels.astype(dt),
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(labels.dtype)


def stn_extract_multi(image: Array, bbox: Array, out_hw: tuple[int, int]) -> Array:
    """Extract all O bbox regions of (B, H, W, C) -> (B, O, Ho, Wo, C)."""
    b, o = bbox.shape[:2]
    rep = jnp.repeat(image, o, axis=0)  # (B*O, H, W, C); XLA fuses this
    ext = stn_extract(rep, bbox.reshape(b * o, 4), out_hw)
    return ext.reshape((b, o) + ext.shape[1:])


# ---------------------------------------------------------------------------
# General affine grid + gather-based sampling (parity / fallback path)
# ---------------------------------------------------------------------------

def affine_grid(theta: Array, out_hw: tuple[int, int]) -> Array:
    """theta (B, 2, 3) -> sampling grid (B, Ho, Wo, 2) of (x, y) in [-1, 1].

    PyTorch-0.4 ``F.affine_grid`` semantics (align_corners=True): grid
    coordinates are linspace(-1, 1, size) inclusive of both endpoints.
    """
    ho, wo = out_hw
    ys = jnp.linspace(-1.0, 1.0, ho, dtype=theta.dtype)
    xs = jnp.linspace(-1.0, 1.0, wo, dtype=theta.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    # elementwise (not einsum): keeps full f32 precision on every backend
    t = theta[:, :, :, None, None]                       # (B, 2, 3, 1, 1)
    out_x = t[:, 0, 0] * gx + t[:, 0, 1] * gy + t[:, 0, 2]
    out_y = t[:, 1, 0] * gx + t[:, 1, 1] * gy + t[:, 1, 2]
    return jnp.stack([out_x, out_y], axis=-1)            # (B, Ho, Wo, 2)


def grid_sample(image: Array, grid: Array) -> Array:
    """Bilinear sample (B, H, W, C) at grid (B, Ho, Wo, 2); zero padding.

    PyTorch-0.4 ``F.grid_sample`` semantics: pixel coords
    ix = (x + 1) / 2 * (W - 1) (align_corners=True), zeros outside.
    Gather-based general path; prefer :func:`stn_separable` for the
    axis-aligned matrices used by the models.
    """
    b, hi, wi, c = image.shape
    dt = jnp.float32
    gx = (grid[..., 0].astype(dt) + 1.0) * 0.5 * (wi - 1)
    gy = (grid[..., 1].astype(dt) + 1.0) * 0.5 * (hi - 1)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1, y1 = x0 + 1.0, y0 + 1.0
    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def fetch(xi, yi):
        inb = (xi >= 0) & (xi <= wi - 1) & (yi >= 0) & (yi <= hi - 1)
        xc = jnp.clip(xi, 0, wi - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, hi - 1).astype(jnp.int32)
        val = jax.vmap(lambda im, yy, xx: im[yy, xx])(image.astype(dt), yc, xc)
        return val * inb[..., None].astype(dt)

    out = (fetch(x0, y0) * (wx0 * wy0)[..., None]
           + fetch(x1, y0) * (wx1 * wy0)[..., None]
           + fetch(x0, y1) * (wx0 * wy1)[..., None]
           + fetch(x1, y1) * (wx1 * wy1)[..., None])
    return out.astype(image.dtype)


def stn(image: Array, theta: Array, out_hw: tuple[int, int]) -> Array:
    """General STN (parity with model.py:73-77): affine_grid + grid_sample."""
    return grid_sample(image, affine_grid(theta, out_hw))
