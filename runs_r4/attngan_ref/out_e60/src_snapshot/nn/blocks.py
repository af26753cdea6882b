"""Reusable Flax building blocks shared by all model variants.

Parity targets (reference files under /root/reference):
  * conv3x3 / upBlock / ResBlock — code/multi-mnist/model.py:9-41
  * GLU / Block3x3 / downBlock / encode_image_by_16times —
    code/coco/attngan/model.py:24-64,575-613
  * weights_init — code/multi-mnist/miscc/utils.py:127-137 (N(0, 0.02) convs,
    BN weight N(1, 0.02)); attngan uses orthogonal convs/linears
    (code/coco/attngan/miscc/utils.py:321-331)
  * BatchNorm — PyTorch BatchNorm2d(momentum=0.1, eps=1e-5): training
    normalizes with BIASED batch variance, running stats are updated with the
    UNBIASED variance; eval normalizes with running stats.

All modules are NHWC (TPU-native layout). ``train`` is threaded explicitly;
BatchNorm state lives in the ``batch_stats`` variable collection. Under a
sharded-batch ``jit`` the batch statistics are computed over the GLOBAL batch
(sync-BN) — the TPU-idiomatic default replacing DataParallel's per-replica
BN. Reference-faithful per-replica statistics are an opt-in:
``set_bn_groups(G)`` / ``MOG_BN_GROUPS=G`` (see BN_GROUPS below).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# Compute dtype for convs/denses (MOG_COMPUTE_DTYPE=bfloat16 stores
# activations in bf16 — halves HBM traffic between conv fusions — while
# params stay f32 (flax casts per-op) and BatchNorm STATISTICS stay f32
# (TorchBatchNorm reduces in f32 either way). bf16 activations also flow
# natively through the STN resampling and the BN normalize (dtype-driven
# branches in ops/stn.py and TorchBatchNorm — parity-critical f32 inputs
# keep the f32/HIGHEST paths). None = flax default (f32 everywhere).
COMPUTE_DTYPE: Optional[jnp.dtype] = (
    jnp.bfloat16
    if os.environ.get("MOG_COMPUTE_DTYPE", "").lower() in ("bf16", "bfloat16")
    else None)


# set True the first time a model block READS one of the trace-time knobs
# (COMPUTE_DTYPE / BN_GROUPS): setting a knob afterwards cannot affect
# already-jitted executables, so the setters warn loudly (ADVICE r3)
_KNOBS_READ: bool = False


def _mark_knobs_read() -> None:
    global _KNOBS_READ
    _KNOBS_READ = True


def compute_dtype() -> Optional[jnp.dtype]:
    """Read COMPUTE_DTYPE at trace time, recording that a knob was read so
    a later set_compute_dtype()/set_bn_groups() warns about stale cached
    executables. EVERY model-side read (incl. eval/init traces) must go
    through here — the marker used to live only in TorchBatchNorm's train
    branch, which missed eval-only jits entirely (round-4 review)."""
    _mark_knobs_read()
    return COMPUTE_DTYPE


def _warn_if_late(name: str) -> None:
    if _KNOBS_READ:
        import warnings

        warnings.warn(
            f"{name} called AFTER a model function was already traced: "
            "executables cached by jax.jit keep the OLD setting; call the "
            "setter before the first jit (resumed runs must re-pass the "
            "same flags — see run_flags.json in the output dir)",
            UserWarning, stacklevel=3)


def set_compute_dtype(dtype: Optional[jnp.dtype]) -> None:
    """Set the conv/dense compute dtype (None = f32, or jnp.bfloat16).

    Read at TRACE time — call before the first jit of any model fn (the
    CLI --bf16 flag and bench.py do). Measured on TPU v5e (mnist train
    step, bs 128): bf16 activations lift throughput 5.4k -> 6.7k img/s
    (MFU 44% -> 55%) with an unchanged loss trajectory; master weights,
    BN statistics, and the STN resampling stay f32.
    """
    global COMPUTE_DTYPE
    if dtype != COMPUTE_DTYPE:
        _warn_if_late("set_compute_dtype")
    COMPUTE_DTYPE = dtype


# Train-mode BatchNorm statistic grouping. 1 = global-batch stats
# (sync-BN, the TPU-idiomatic default). G > 1 = per-group stats over G
# contiguous batch chunks — EXACT nn.parallel.data_parallel semantics for
# a G-GPU reference run (DataParallel scatters the batch contiguously and
# each replica normalizes with its own stats,
# code/multi-mnist/trainer.py:42-46; running stats keep only replica 0's
# update because replica 0 IS the master module). Set G = the reference
# run's GPU count to reproduce its training dynamics bit-for-bit; under a
# data-sharded mesh with G = device count the group axis coincides with
# the shard axis, so each group's stats stay device-local.
BN_GROUPS: int = int(os.environ.get("MOG_BN_GROUPS", "1") or "1")


def set_bn_groups(groups: int) -> None:
    """Set train-mode BN statistic grouping (read at TRACE time — call
    before the first jit, like :func:`set_compute_dtype`). 1 = sync-BN;
    G > 1 = per-replica DataParallel semantics over G batch chunks."""
    global BN_GROUPS
    if int(groups) != BN_GROUPS:
        _warn_if_late("set_bn_groups")
    BN_GROUPS = int(groups)


# Object-pathway fold marker. The reference runs its object pathways as a
# sequential per-object Python loop — each of the O iterations calls the
# SAME conv+BN modules on a B-sized batch, so train-mode BN statistics
# are per-OBJECT, and the running buffers receive O sequential EMA
# updates per forward (code/multi-mnist/model.py:162-169,227-234;
# code/coco/stackgan/model.py:201-214). The TPU formulation folds the
# object axis into the batch ((B, O) -> (B*O), O minor) for one big
# launch; ``object_fold(o)`` marks those segments at trace time so
# TorchBatchNorm reproduces the reference statistics EXACTLY: stats per
# object slice (vectorized — no loop), running stats via the closed-form
# sequential EMA. Composes with BN_GROUPS (DataParallel chunks the batch
# first, each replica then loops objects).
OBJECT_FOLD: int = 1


class object_fold:
    """Trace-time context: the leading axis of tensors inside is (B, O)
    folded with O minor; BN computes per-object statistics."""

    def __init__(self, o: int):
        self.o = int(o)

    def __enter__(self):
        global OBJECT_FOLD
        self._prev = OBJECT_FOLD
        OBJECT_FOLD = self.o
        return self

    def __exit__(self, *exc):
        global OBJECT_FOLD
        OBJECT_FOLD = self._prev
        return False

def conv_dt(*args, **kwargs):
    """nn.Conv bound to COMPUTE_DTYPE (param trees unchanged — flax names
    still derive from the Conv class)."""
    return nn.Conv(*args, dtype=compute_dtype(), **kwargs)


# --- initializers matching the reference's weights_init ---------------------

def normal_init(stddev: float = 0.02):
    return nn.initializers.normal(stddev=stddev)


def bn_scale_init(key, shape, dtype=jnp.float32):
    """BN weight ~ N(1.0, 0.02) (miscc/utils.py:131-132)."""
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.02


def orthogonal_init():
    """attngan conv/linear init (miscc/utils.py:323-330)."""
    return nn.initializers.orthogonal(scale=1.0)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact PyTorch BatchNorm2d semantics.

    * train: y = (x - mean_b) / sqrt(var_b_biased + eps) * w + b
             running <- (1 - momentum) * running + momentum * stat,
             with the UNBIASED variance going into running_var.
    * eval:  normalize with running stats.

    Normalizes over all axes except the last (channel) axis, so it serves as
    both BatchNorm2d (NHWC) and BatchNorm1d (NC).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    scale_init: Callable = bn_scale_init

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if train:
            _mark_knobs_read()
            groups = 1 if self.is_initializing() else BN_GROUPS
            fold = 1 if self.is_initializing() else OBJECT_FOLD
            if fold > 1:
                return self._train_object_fold(x, fold, groups, scale,
                                               bias, ra_mean, ra_var)
            if groups > 1:
                return self._train_grouped(x, groups, scale, bias,
                                           ra_mean, ra_var)
            red = tuple(range(x.ndim - 1))
            n = 1
            for ax in red:
                n *= x.shape[ax]

            if x.dtype == jnp.bfloat16:
                # Mixed-precision path: statistics accumulate in f32
                # (dtype= on the reductions — the converts fuse into the
                # reduce inputs), but the normalize affine runs natively
                # in bf16 with per-channel f32 scalars cast down. The
                # alternative — one f32 upcast of x shared by stats and
                # normalize — MATERIALIZES the upcast (plus a layout
                # copy) at 2x the layer's bytes in both forward and
                # backward; measured as the dominant waste of the
                # bandwidth-bound train steps.
                mean = jnp.mean(x, axis=red, dtype=jnp.float32)
                sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=red)
                var = sq - jnp.square(mean)
                inv = jax.lax.rsqrt(var + self.eps) * scale
                y = ((x - mean.astype(x.dtype))
                     * inv.astype(x.dtype) + bias.astype(x.dtype))
            else:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=red)
                var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
                inv = jax.lax.rsqrt(var + self.eps) * scale
                y = ((xf - mean) * inv + bias).astype(x.dtype)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
            return y

        mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)

    def _train_grouped(self, x: Array, groups: int, scale, bias,
                       ra_mean, ra_var) -> Array:
        """Per-group train-mode stats (BN_GROUPS > 1): each contiguous
        batch chunk normalizes with its own mean/var, and the running
        stats take only group 0's update — exactly DataParallel over
        `groups` GPUs (the master replica's buffers are the module's).

        Chunk boundaries follow ``torch.chunk`` (what DataParallel's
        scatter uses): ceil(b/G)-sized chunks with a short tail. The
        matching-aware "wrong pair" branch routes b-1 rows through D's
        cond head (trainer.py:42-46 wraps every such call), so uneven
        batches MUST split exactly as the reference does on G GPUs —
        e.g. 127 rows over 2 GPUs is 64+63, each with its own stats."""
        b, c = x.shape[0], x.shape[-1]
        if b % groups:
            return self._train_grouped_uneven(x, groups, scale, bias,
                                              ra_mean, ra_var)
        xg = x.reshape((groups, b // groups) + x.shape[1:])
        red = tuple(range(1, xg.ndim - 1))
        n = 1
        for ax in red:
            n *= xg.shape[ax]

        if x.dtype == jnp.bfloat16:
            mean = jnp.mean(xg, axis=red, keepdims=True, dtype=jnp.float32)
            sq = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=red,
                          keepdims=True)
            var = sq - jnp.square(mean)
            inv = jax.lax.rsqrt(var + self.eps) * scale
            y = ((xg - mean.astype(xg.dtype)) * inv.astype(xg.dtype)
                 + bias.astype(xg.dtype))
        else:
            xf = xg.astype(jnp.float32)
            mean = jnp.mean(xf, axis=red, keepdims=True)
            var = (jnp.mean(jnp.square(xf), axis=red, keepdims=True)
                   - jnp.square(mean))
            inv = jax.lax.rsqrt(var + self.eps) * scale
            y = ((xf - mean) * inv + bias).astype(x.dtype)
        if not self.is_initializing():
            m0 = mean[0].reshape((c,))
            v0 = var[0].reshape((c,)) * (n / max(n - 1, 1))
            ra_mean.value = ((1 - self.momentum) * ra_mean.value
                             + self.momentum * m0)
            ra_var.value = ((1 - self.momentum) * ra_var.value
                            + self.momentum * v0)
        return y.reshape(x.shape)

    def _train_object_fold(self, x: Array, fold: int, groups: int,
                           scale, bias, ra_mean, ra_var) -> Array:
        """Exact reference object-pathway BN: the leading axis is (B, O)
        folded with O minor (see :class:`object_fold`). Statistics are
        computed per (replica chunk, object) slice — what the reference's
        sequential per-object loop produces on each DataParallel replica
        — and the running buffers get replica 0's O sequential EMA
        updates, applied in closed form:

            new = (1-m)^O * old + sum_o m * (1-m)^(O-1-o) * stat_o

        All vectorized: one reshape + one reduction, no per-object loop.
        """
        import numpy as np

        bo, c = x.shape[0], x.shape[-1]
        if bo % fold:
            raise ValueError(
                f"object_fold({fold}) does not divide the folded batch "
                f"({bo})")
        b = bo // fold
        if b % groups:
            raise ValueError(
                f"BN_GROUPS={groups} must divide the object-pathway batch "
                f"({b}) — object pathways always see the full batch")
        xg = x.reshape((groups, b // groups, fold) + x.shape[1:])
        red = (1,) + tuple(range(3, xg.ndim - 1))
        n = b // groups
        for ax in red[1:]:
            n *= xg.shape[ax]

        if x.dtype == jnp.bfloat16:
            mean = jnp.mean(xg, axis=red, keepdims=True, dtype=jnp.float32)
            sq = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=red,
                          keepdims=True)
            var = sq - jnp.square(mean)
            inv = jax.lax.rsqrt(var + self.eps) * scale
            y = ((xg - mean.astype(xg.dtype)) * inv.astype(xg.dtype)
                 + bias.astype(xg.dtype))
        else:
            xf = xg.astype(jnp.float32)
            mean = jnp.mean(xf, axis=red, keepdims=True)
            var = (jnp.mean(jnp.square(xf), axis=red, keepdims=True)
                   - jnp.square(mean))
            inv = jax.lax.rsqrt(var + self.eps) * scale
            y = ((xf - mean) * inv + bias).astype(x.dtype)
        if not self.is_initializing():
            m = self.momentum
            mean0 = mean[0, 0].reshape(fold, c)      # replica 0, per object
            var0u = var[0, 0].reshape(fold, c) * (n / max(n - 1, 1))
            w = jnp.asarray(
                np.array([m * (1 - m) ** (fold - 1 - i)
                          for i in range(fold)], np.float32))[:, None]
            decay = (1 - m) ** fold
            ra_mean.value = decay * ra_mean.value + jnp.sum(w * mean0, 0)
            ra_var.value = decay * ra_var.value + jnp.sum(w * var0u, 0)
        return y.reshape(x.shape)

    def _train_grouped_uneven(self, x: Array, groups: int, scale, bias,
                              ra_mean, ra_var) -> Array:
        """Non-divisible-batch grouped BN: unrolled trace-time loop over
        the torch.chunk boundaries (all static — batch sizes are shapes).
        Rare (only the wrong-pair b-1 branch in practice) and tiny there
        (4x4 head activations), so the unroll costs nothing measurable."""
        b, c = x.shape[0], x.shape[-1]
        s = -(-b // groups)  # torch.chunk: ceil-sized chunks, short tail
        red = tuple(range(x.ndim - 1))
        outs, first = [], None
        for lo in range(0, b, s):
            xc = x[lo:lo + s]
            n = xc.shape[0]
            for ax in red[1:]:
                n *= xc.shape[ax]
            if xc.dtype == jnp.bfloat16:
                mean = jnp.mean(xc, axis=red, dtype=jnp.float32)
                sq = jnp.mean(jnp.square(xc.astype(jnp.float32)), axis=red)
                var = sq - jnp.square(mean)
                inv = jax.lax.rsqrt(var + self.eps) * scale
                y = ((xc - mean.astype(xc.dtype)) * inv.astype(xc.dtype)
                     + bias.astype(xc.dtype))
            else:
                xf = xc.astype(jnp.float32)
                mean = jnp.mean(xf, axis=red)
                var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
                inv = jax.lax.rsqrt(var + self.eps) * scale
                y = ((xf - mean) * inv + bias).astype(xc.dtype)
            outs.append(y)
            if first is None:
                first = (mean, var, n)
        if not self.is_initializing():
            mean, var, n = first
            ra_mean.value = ((1 - self.momentum) * ra_mean.value
                             + self.momentum * mean)
            ra_var.value = ((1 - self.momentum) * ra_var.value
                            + self.momentum * var * (n / max(n - 1, 1)))
        return jnp.concatenate(outs, axis=0)


class Conv3x3(nn.Module):
    """3x3 conv, pad 1, no bias (model.py:9-12)."""

    features: int
    stride: int = 1
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                       padding=1, use_bias=False, dtype=compute_dtype(),
                       kernel_init=self.kernel_init)(x)


class Conv1x1(nn.Module):
    """1x1 conv, no bias (attngan model.py:35-38)."""

    features: int
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=compute_dtype(),
                       kernel_init=self.kernel_init)(x)


def upsample_nearest_2x(x: Array) -> Array:
    """2x nearest-neighbor upsample (torch nn.Upsample(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class _ConvKernel(nn.Module):
    """Bare 3x3 conv kernel param, named like nn.Conv's so checkpoint
    trees and importers are unaffected (path .../Conv_0/kernel)."""

    features: int
    kernel_init: Callable

    @nn.compact
    def __call__(self, cin: int) -> Array:
        return self.param("kernel", self.kernel_init,
                          (3, 3, cin, self.features))


class UpConv3x3(nn.Module):
    """conv3x3(nearest_up_2x(x)) as ONE input-dilated conv — EXACT same
    math: nearest-2x is a transposed conv with a 2x2 ones kernel, so the
    composite is a single lhs_dilation=(2,2) conv with the composed 4x4
    kernel K4 = K (*) ones(2x2). No 4x-materialized upsampled
    intermediate, no extra passes. Param tree identical to
    [upsample + Conv3x3] (the stored param stays the 3x3 kernel).

    Measured on TPU v5e (bf16, reference batches) vs the naive
    upsample+conv: mnist train step 15.3 -> 12.8 ms (10,009 img/s),
    stage-2 137 -> 117 ms, attngan ~flat. It also beats the earlier
    four-phase-conv decomposition (interleave copies) at every size, so
    it is the default everywhere; MOG_UPCONV=phase|naive keep the other
    formulations A/B-able (the phase path gates on MOG_PHASE_MAX_OUT).
    """

    features: int
    kernel_init: Callable = normal_init()
    # None -> MOG_PHASE_MAX_OUT read at trace time (A/B-able post-import)
    phase_max_out: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, cin = x.shape
        dt = compute_dtype()
        k = _ConvKernel(self.features, self.kernel_init, name="Conv_0")(cin)
        mode = os.environ.get("MOG_UPCONV", "dilated")
        # env read at trace time (like MOG_UPCONV) so post-import env
        # changes are honored in A/B runs; an explicit field wins
        phase_max_out = (self.phase_max_out if self.phase_max_out is not None
                         else int(os.environ.get("MOG_PHASE_MAX_OUT", "64")))
        if mode == "dilated":
            kk = k if dt is None else k.astype(dt)
            xx = x if dt is None else x.astype(dt)
            r = jnp.stack([kk[0], kk[0] + kk[1], kk[1] + kk[2], kk[2]],
                          axis=0)
            k4 = jnp.stack([r[:, 0], r[:, 0] + r[:, 1],
                            r[:, 1] + r[:, 2], r[:, 2]], axis=1)
            return jax.lax.conv_general_dilated(
                xx, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if mode == "naive" or 2 * max(h, w) > phase_max_out:
            kk = k if dt is None else k.astype(dt)
            xx = upsample_nearest_2x(x if dt is None else x.astype(dt))
            return jax.lax.conv_general_dilated(
                xx, kk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # row/col groups: output phase d=0 sees source offsets {-1, 0}
        # with weights {W0, W1+W2}; phase d=1 sees {0, +1} with
        # {W0+W1, W2} (derived from up[p] = x[p // 2])
        ky0 = jnp.stack([k[0], k[1] + k[2]], axis=0)        # (2,3,ci,co)
        ky1 = jnp.stack([k[0] + k[1], k[2]], axis=0)

        def colmix(km, d):
            if d == 0:
                return jnp.stack([km[:, 0], km[:, 1] + km[:, 2]], axis=1)
            return jnp.stack([km[:, 0] + km[:, 1], km[:, 2]], axis=1)

        kall = jnp.concatenate(
            [colmix(ky0, 0), colmix(ky0, 1),
             colmix(ky1, 0), colmix(ky1, 1)], axis=-1)      # (2,2,ci,4co)

        if dt is not None:
            x = x.astype(dt)
            kall = kall.astype(dt)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jax.lax.conv_general_dilated(
            xp, kall, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))     # (B,H+1,W+1,4co)
        co = self.features
        p00 = out[:, :h, :w, 0 * co:1 * co]
        p01 = out[:, :h, 1:, 1 * co:2 * co]
        p10 = out[:, 1:, :w, 2 * co:3 * co]
        p11 = out[:, 1:, 1:, 3 * co:4 * co]
        y = jnp.stack([jnp.stack([p00, p01], axis=3),
                       jnp.stack([p10, p11], axis=3)], axis=2)
        return y.reshape(b, 2 * h, 2 * w, co)               # (B,2H,2W,co)


class UpBlock(nn.Module):
    """2x nearest upsample + conv3x3 + BN + ReLU (model.py:16-22)."""

    features: int
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        # fused phase-conv path == upsample_nearest_2x + Conv3x3, exactly
        x = UpConv3x3(self.features, kernel_init=self.kernel_init,
                      name="Conv3x3_0")(x)
        x = TorchBatchNorm()(x, train)
        return nn.relu(x)


def glu(x: Array) -> Array:
    """Gated linear unit over the channel axis (attngan model.py:24-32)."""
    c = x.shape[-1]
    a, b = x[..., : c // 2], x[..., c // 2:]
    return a * jax.nn.sigmoid(b)


class UpBlockGLU(nn.Module):
    """attngan upBlock: upsample + conv3x3(2f) + BN + GLU (model.py:48-55)."""

    features: int
    kernel_init: Callable = orthogonal_init()

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = UpConv3x3(self.features * 2, kernel_init=self.kernel_init,
                      name="Conv3x3_0")(x)
        x = TorchBatchNorm()(x, train)
        return glu(x)


class ResBlock(nn.Module):
    """conv-BN-ReLU-conv-BN + skip, ReLU (model.py:25-41)."""

    features: int
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        h = Conv3x3(self.features, kernel_init=self.kernel_init)(x)
        h = TorchBatchNorm()(h, train)
        h = nn.relu(h)
        h = Conv3x3(self.features, kernel_init=self.kernel_init)(h)
        h = TorchBatchNorm()(h, train)
        return nn.relu(h + x)


class ResBlockGLU(nn.Module):
    """attngan ResBlock: conv(2f)+BN+GLU, conv(f)+BN, + skip (model.py:67-81).
    NOTE: no final ReLU, unlike the stage-1 ResBlock."""

    features: int
    kernel_init: Callable = orthogonal_init()

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        h = Conv3x3(self.features * 2, kernel_init=self.kernel_init)(x)
        h = TorchBatchNorm()(h, train)
        h = glu(h)
        h = Conv3x3(self.features, kernel_init=self.kernel_init)(h)
        h = TorchBatchNorm()(h, train)
        return h + x


class Block3x3ReLU(nn.Module):
    """attngan Block3x3_relu: conv3x3(2f) + BN + GLU (model.py:59-64)."""

    features: int
    kernel_init: Callable = orthogonal_init()

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = Conv3x3(self.features * 2, kernel_init=self.kernel_init)(x)
        x = TorchBatchNorm()(x, train)
        return glu(x)


class Block3x3LeakReLU(nn.Module):
    """attngan Block3x3_leakRelu: conv3x3 + BN + LeakyReLU(0.2)
    (model.py:586-593)."""

    features: int
    kernel_init: Callable = orthogonal_init()

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = Conv3x3(self.features, kernel_init=self.kernel_init)(x)
        x = TorchBatchNorm()(x, train)
        return nn.leaky_relu(x, 0.2)


class DownBlock(nn.Module):
    """attngan downBlock: conv4x4 stride 2 + BN + LeakyReLU (model.py:596-603)."""

    features: int
    kernel_init: Callable = orthogonal_init()

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = nn.Conv(self.features, (4, 4), strides=(2, 2), padding=1,
                    use_bias=False, dtype=compute_dtype(),
                    kernel_init=self.kernel_init)(x)
        x = TorchBatchNorm()(x, train)
        return nn.leaky_relu(x, 0.2)


class EncodeImageBy16Times(nn.Module):
    """attngan encode_image_by_16times: 4 stride-2 conv4x4 blocks, the first
    without BN (model.py:606-613 era: conv-lrelu, then 3x conv-BN-lrelu)."""

    ndf: int
    kernel_init: Callable = orthogonal_init()

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        dt = compute_dtype()
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                    use_bias=False, dtype=dt,
                    kernel_init=self.kernel_init)(x)
        x = nn.leaky_relu(x, 0.2)
        for mult in (2, 4, 8):
            x = nn.Conv(self.ndf * mult, (4, 4), strides=(2, 2), padding=1,
                        use_bias=False, dtype=dt,
                        kernel_init=self.kernel_init)(x)
            x = TorchBatchNorm()(x, train)
            x = nn.leaky_relu(x, 0.2)
        return x


class Dense(nn.Module):
    """Linear with reference init; optional bias."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = normal_init()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.features, use_bias=self.use_bias,
                        dtype=compute_dtype(),
                        kernel_init=self.kernel_init,
                        bias_init=nn.initializers.zeros)(x)
