"""SPIKE: fused (inline-BN-normalize -> conv3x3 -> stats) Pallas kernel.

Question to answer (ROADMAP round-2 'candidates' #1): the mnist train step
is bandwidth-bound and train-mode BatchNorm accounts for ~19% of its XLA
bytes accessed (measured by ablating BN to a pure affine: 29.4 -> 23.8 GB).
Can a Pallas kernel chain that keeps BN entirely inside the conv pipeline
(normalize the producer's RAW conv output on the fly while loading tiles,
and accumulate the next BN's sum/sumsq while storing) beat XLA's
conv + reduce + normalize chain at the hot shapes?

Kernel contract (one link of the chain):
    y_raw, s_sum, s_sq = normconv(x_raw, mean, var, gamma, beta, w)
      where x_norm = relu((x_raw - mean) * gamma / sqrt(var+eps) + beta)
            y_raw  = conv3x3(x_norm, w)          # raw, pre-BN output
            s_*    = per-channel sum / sum-of-squares of y_raw
                     (the NEXT link's BN statistics, already reduced)
vs the XLA baseline of the same math written the idiomatic Flax way.

This is a FORWARD-ONLY spike: if the fused forward does not win clearly,
the (much harder) backward is not worth building. Run on TPU:
    python tools/spike_normconv.py          # perf A/B at the hot shapes
    python tools/spike_normconv.py --check  # correctness vs XLA (any host)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


# --------------------------------------------------------------------------
# Pallas fused kernel
# --------------------------------------------------------------------------
def _normconv_kernel(x_ref, scale_ref, shift_ref, w_ref,
                     y_ref, sum_ref, sq_ref, acc_ref):
    """One batch-tile of: relu(x*scale+shift) -> conv3x3 -> stats.

    x_ref:     (TB, H+2, W+2, Cin)  raw producer output, spatially padded
    scale_ref: (1, Cin)  folded gamma/sqrt(var+eps)
    shift_ref: (1, Cin)  folded beta - mean*scale
    w_ref:     (9 * Cin, Cout)
    y_ref:     (TB, H, W, Cout) raw output (pre-BN)
    sum_ref:   (8, Cout) partial per-channel sums (one row used)
    sq_ref:    (8, Cout) partial per-channel sum-of-squares
    acc_ref:   f32 scratch (TB*H*W, Cout)
    """
    tb, hp, wp, cin = x_ref.shape
    h, w = hp - 2, wp - 2
    cout = y_ref.shape[-1]

    # normalize + relu once into VMEM (padding columns stay whatever they
    # are; the affine of real zeros is handled by passing pre-padded
    # x_raw whose pad entries normalize to relu(shift) — the caller pads
    # AFTER folding so pad contributes shift; to keep exact conv-on-
    # normalized-interior semantics the caller pads x_norm's zeros as
    # (0 - shift)/scale... simpler: caller guarantees pad entries already
    # equal the value that normalizes to 0. See normconv() below.)
    xn = jnp.maximum(
        x_ref[...].astype(jnp.float32) * scale_ref[0, :] + shift_ref[0, :],
        0.0).astype(jnp.bfloat16)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            patch = xn[:, dy:dy + h, dx:dx + w, :].reshape(tb * h * w, cin)
            wk = w_ref[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin, :]
            acc_ref[...] += jnp.dot(patch, wk,
                                    preferred_element_type=jnp.float32)
    y = acc_ref[...]
    y_ref[...] = y.reshape(tb, h, w, cout).astype(y_ref.dtype)
    sum_ref[...] = jnp.zeros_like(sum_ref)
    sq_ref[...] = jnp.zeros_like(sq_ref)
    sum_ref[0, :] = jnp.sum(y, axis=0)
    sq_ref[0, :] = jnp.sum(y * y, axis=0)


def normconv(x_raw, mean, var, gamma, beta, w3x3, *, tile_b: int = 8,
             interpret: bool = False):
    """relu(BN(x_raw)) -> conv3x3 (SAME) -> (y_raw, sum, sumsq).

    x_raw: (B, H, W, Cin) the producer's raw conv output (any float dtype)
    w3x3:  (3, 3, Cin, Cout)
    Returns y_raw (B, H, W, Cout) bf16 + per-channel f32 sum/sumsq of y.
    """
    b, h, wd, cin = x_raw.shape
    cout = w3x3.shape[-1]
    assert b % tile_b == 0, (b, tile_b)
    scale = (gamma / jnp.sqrt(var + EPS)).astype(jnp.float32)
    shift = (beta - mean * scale).astype(jnp.float32)

    # Pad with the value whose affine is exactly 0 (so relu(affine(pad))
    # == 0 == zero-padding of the normalized tensor): pad = -shift/scale.
    pad_val = jnp.where(scale != 0, -shift / scale, 0.0)
    xp = jnp.pad(x_raw.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=0.0)
    # overwrite the pad ring with pad_val per channel
    ring = jnp.ones((b, h + 2, wd + 2, 1), bool
                    ).at[:, 1:-1, 1:-1, :].set(False)
    xp = jnp.where(ring, pad_val[None, None, None, :], xp)
    xp = xp.astype(jnp.bfloat16)

    wflat = w3x3.reshape(9 * cin, cout).astype(jnp.bfloat16)
    grid = (b // tile_b,)
    y, s1, s2 = pl.pallas_call(
        _normconv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, h + 2, wd + 2, cin),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, h, wd, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wd, cout), jnp.bfloat16),
            jax.ShapeDtypeStruct((grid[0] * 8, cout), jnp.float32),
            jax.ShapeDtypeStruct((grid[0] * 8, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b * h * wd, cout), jnp.float32)],
        interpret=interpret,
    )(xp, scale[None], shift[None], wflat)
    return y, s1.sum(axis=0), s2.sum(axis=0)


# --------------------------------------------------------------------------
# XLA baseline: identical math, idiomatic formulation
# --------------------------------------------------------------------------
def normconv_xla(x_raw, mean, var, gamma, beta, w3x3):
    xn = (x_raw.astype(jnp.float32) - mean) / jnp.sqrt(var + EPS)
    xn = jnp.maximum(xn * gamma + beta, 0.0).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        xn, w3x3.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    s1 = jnp.sum(y, axis=(0, 1, 2))
    s2 = jnp.sum(y * y, axis=(0, 1, 2))
    return y.astype(jnp.bfloat16), s1, s2


def _make_inputs(key, b, h, w, cin, cout):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (cin,))
    beta = 0.1 * jax.random.normal(ks[2], (cin,))
    w3 = jax.random.normal(ks[3], (3, 3, cin, cout)) * 0.05
    return x.astype(jnp.bfloat16), mean, var, gamma, beta, w3


def check(interpret=True):
    key = jax.random.PRNGKey(0)
    for (b, h, w, cin, cout, tb) in [(8, 16, 16, 128, 128, 4),
                                     (8, 8, 8, 256, 128, 8)]:
        x, mean, var, gamma, beta, w3 = _make_inputs(key, b, h, w, cin, cout)
        y1, s1a, s2a = normconv(x, mean, var, gamma, beta, w3, tile_b=tb,
                                interpret=interpret)
        y2, s1b, s2b = normconv_xla(x, mean, var, gamma, beta, w3)
        err = np.abs(np.asarray(y1, np.float32)
                     - np.asarray(y2, np.float32)).max()
        scale = np.abs(np.asarray(y2, np.float32)).max()
        rs1 = np.abs(np.asarray(s1a - s1b)).max() / (
            np.abs(np.asarray(s1b)).max() + 1e-6)
        rs2 = np.abs(np.asarray(s2a - s2b)).max() / (
            np.abs(np.asarray(s2b)).max() + 1e-6)
        print(f"shape {(b, h, w, cin, cout)}: |dy|max={err:.4f} "
              f"(|y|max={scale:.2f}), rel dsum={rs1:.2e} dsq={rs2:.2e}")
        assert err / scale < 0.05 and rs1 < 0.02 and rs2 < 0.02
    print("CHECK OK")


def bench():
    # hot mnist-step shapes (bs 128, GF_DIM=128 -> ngf=1024)
    # tile_b sized to the 16MB scoped-VMEM limit (tb=8 @ cin=512 OOMs:
    # 19.2M scoped stack)
    shapes = [
        ("local2 16x16 512->256 (xB*O=384)", 384, 16, 16, 512, 256, 4),
        ("up3-ish 32x32 256->128", 128, 32, 32, 256, 128, 4),
        ("16x16 512->256", 128, 16, 16, 512, 256, 4),
    ]
    for name, b, h, w, cin, cout, tb in shapes:
        x, mean, var, gamma, beta, w3 = _make_inputs(
            jax.random.PRNGKey(1), b, h, w, cin, cout)
        f_pl = jax.jit(functools.partial(normconv, tile_b=tb))
        f_xla = jax.jit(normconv_xla)
        for tag, f in [("pallas", f_pl), ("xla", f_xla)]:
            y, s1, s2 = f(x, mean, var, gamma, beta, w3)
            float(s1[0])  # sync
            n = 50
            t0 = time.perf_counter()
            for _ in range(n):
                y, s1, s2 = f(x, mean, var, gamma, beta, w3)
            sync = float(s1[0])
            dt = (time.perf_counter() - t0) / n
            gb = (x.size * 2 + y.size * 2) / 1e9
            print(f"{name:38s} {tag:6s} {dt*1e6:8.1f} us  "
                  f"({gb/dt:.0f} GB/s streamed)  sync={sync:.1f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true")
    args = p.parse_args()
    if args.check:
        jax.config.update("jax_platforms", "cpu")
        check(interpret=True)
    else:
        check(interpret=False)
        bench()
