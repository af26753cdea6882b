"""Quantitative eval: FID over Inception-v3 pooled features.

The reference computes FID/IS externally (SURVEY.md §4: "run as an external
process"); this module makes the quantitative loop self-contained. FID uses
the 2048-d pooled features of the same Inception-v3 backbone that powers the
DAMSM image encoder (nn/encoders.py; weights imported from the published
image_encoder .pth for meaningful numbers).
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


def inception_activations(image_encoder, enc_vars, images: np.ndarray,
                          batch_size: int = 32) -> np.ndarray:
    """images (N, H, W, 3) in [-1, 1] -> (N, 2048) pooled features."""

    @jax.jit
    def feats(x):
        _, _, pool = image_encoder.apply(enc_vars, x, train=False,
                                         return_pool=True)
        return pool

    out = []
    n = images.shape[0]
    for i in range(0, n - n % batch_size, batch_size):
        out.append(np.asarray(feats(jnp.asarray(images[i:i + batch_size]))))
    rem = n % batch_size
    if rem:
        pad = np.concatenate([images[n - rem:],
                              np.zeros((batch_size - rem,)
                                       + images.shape[1:], images.dtype)])
        out.append(np.asarray(feats(jnp.asarray(pad)))[:rem])
    return np.concatenate(out, axis=0)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two Gaussians (standard Heusel et al. formulation)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def fid_from_activations(act1: np.ndarray, act2: np.ndarray) -> float:
    mu1, mu2 = act1.mean(0), act2.mean(0)
    s1 = np.cov(act1, rowvar=False)
    s2 = np.cov(act2, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


def compute_fid(image_encoder, enc_vars, real_images: np.ndarray,
                fake_images: np.ndarray, batch_size: int = 32) -> float:
    a1 = inception_activations(image_encoder, enc_vars, real_images,
                               batch_size)
    a2 = inception_activations(image_encoder, enc_vars, fake_images,
                               batch_size)
    return fid_from_activations(a1, a2)
