"""Quantitative eval: FID over Inception-v3 pooled features.

The reference computes FID/IS externally (SURVEY.md §4: "run as an external
process"); this module makes the quantitative loop self-contained. FID uses
the 2048-d pooled features of the same Inception-v3 backbone that powers the
DAMSM image encoder (nn/encoders.py; weights imported from the published
image_encoder .pth for meaningful numbers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=4)
def _feats_fn(image_encoder):
    """One compiled pooled-features fn per encoder module. enc_vars enter
    as jit ARGUMENTS — baking ~24M Inception params into the jaxpr as
    closure constants both re-pays the compile on every call and trips
    the tunneled-TPU remote-compile size limit (HTTP 413; see CLAUDE.md)."""

    @jax.jit
    def feats(enc_vars, x):
        _, _, pool = image_encoder.apply(enc_vars, x, train=False,
                                         return_pool=True)
        return pool.astype(jnp.float32)

    return feats


def inception_activations(image_encoder, enc_vars, images: np.ndarray,
                          batch_size: int = 32) -> np.ndarray:
    """images (N, H, W, 3) in [-1, 1] -> (N, 2048) pooled features."""
    feats = _feats_fn(image_encoder)
    out = []
    n = images.shape[0]
    for i in range(0, n - n % batch_size, batch_size):
        out.append(np.asarray(feats(enc_vars,
                                    jnp.asarray(images[i:i + batch_size]))))
    rem = n % batch_size
    if rem:
        pad = np.concatenate([images[n - rem:],
                              np.zeros((batch_size - rem,)
                                       + images.shape[1:], images.dtype)])
        out.append(np.asarray(feats(enc_vars, jnp.asarray(pad)))[:rem])
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


def resolve_fid_encoder(image_encoder=None, enc_vars=None,
                        provenance: str = "random"):
    """Choose the FID feature encoder and report its provenance.

    Returns ``(module, variables, provenance)`` where provenance is one of
      * ``"fid_canonical"`` — $FID_INCEPTION_WEIGHTS points at the
        pytorch-fid pt_inception (or a torchvision inception_v3) .pth and
        the canonical pool3 encoder (nn/fid_inception.py) is used. The
        ONLY setting whose FID is comparable to published numbers
        (BASELINE.md; ref eval context /root/reference/index.md:203).
      * ``"damsm"`` — the caller-passed DAMSM image-encoder backbone with
        imported weights (self-consistent, NOT the published metric).
      * ``"random"`` — a randomly initialized backbone (trend-only).
    """
    import os

    path = os.environ.get("FID_INCEPTION_WEIGHTS", "")
    if path and os.path.exists(path):
        from multiple_objects_gan_tpu.nn.fid_inception import (
            create_fid_encoder)
        module, variables = create_fid_encoder(path)
        return module, variables, "fid_canonical"
    if path:
        print(f"WARNING: $FID_INCEPTION_WEIGHTS={path!r} does not exist — "
              "falling back to the non-canonical FID encoder", flush=True)
    return image_encoder, enc_vars, provenance


def load_inception_fc(path: str):
    """Load the 1000-class classifier head (fc.weight/fc.bias) from a
    torchvision inception_v3 state_dict (.pth) or an .npz with keys
    'weight' (1000, 2048) and 'bias' (1000,). Returns (W (2048, 1000), b)."""
    if path.endswith(".npz"):
        z = np.load(path)
        return np.asarray(z["weight"], np.float32).T, np.asarray(
            z["bias"], np.float32)
    from multiple_objects_gan_tpu.io.pycompat import torch_load

    sd = torch_load(path)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return (np.asarray(sd["fc.weight"], np.float32).T,
            np.asarray(sd["fc.bias"], np.float32))


def resolve_inception_fc(fc=None):
    """Resolve the IS classifier head and report its provenance.

    Returns ``(fc, provenance)`` where fc is (W (2048, 1000), b (1000,))
    and provenance is ``"imported"`` (caller-passed weights or
    $INCEPTION_V3_WEIGHTS) or ``"random"`` (deterministic placeholder head
    — the IS value is then NOT comparable to published numbers).
    Downstream eval writers record the provenance in eval_metrics.json so
    a consumer can tell a real IS from a placeholder."""
    import os

    if fc is not None:
        return fc, "imported"
    env = os.environ.get("INCEPTION_V3_WEIGHTS", "")
    if env and os.path.exists(env):
        return load_inception_fc(env), "imported"
    print("WARNING: no Inception classifier head "
          "($INCEPTION_V3_WEIGHTS unset) — IS uses a random head; "
          "value is not comparable to published numbers", flush=True)
    rng = np.random.RandomState(0)
    return (rng.randn(2048, 1000).astype(np.float32) * 0.05,
            np.zeros(1000, np.float32)), "random"


def inception_score(image_encoder, enc_vars, images: np.ndarray = None,
                    batch_size: int = 32, splits: int = 10,
                    fc=None, acts: np.ndarray = None) -> tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) (Salimans et al. 2016) over the
    1000-class Inception-v3 head on the 2048-d pooled features.

    ``fc``: optional (W (2048, 1000), b (1000,)) classifier weights — pass
    :func:`load_inception_fc` of a full torchvision inception_v3
    state_dict, or set $INCEPTION_V3_WEIGHTS. The DAMSM image-encoder .pth
    does not contain the head (the reference drops it,
    code/coco/attngan/model.py:215-230), so without imported weights a
    deterministic random head is used: the pipeline runs end-to-end but the
    absolute value is NOT comparable to published IS numbers.
    """
    if acts is None:
        acts = inception_activations(image_encoder, enc_vars, images,
                                     batch_size)
    fc, _ = resolve_inception_fc(fc)
    w, b = fc
    logits = acts @ w + b
    logits -= logits.max(axis=1, keepdims=True)
    probs = np.exp(logits)
    probs /= probs.sum(axis=1, keepdims=True)

    n = probs.shape[0]
    scores = []
    for k in range(splits):
        part = probs[k * n // splits:(k + 1) * n // splits]
        if part.shape[0] == 0:
            continue
        marginal = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part + 1e-12)
                      - np.log(marginal + 1e-12))).sum(axis=1)
        scores.append(float(np.exp(kl.mean())))
    return float(np.mean(scores)), float(np.std(scores))
