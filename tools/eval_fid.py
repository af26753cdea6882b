"""Standalone FID / Inception-Score eval between two image directories.

The reference computes FID/IS externally (SURVEY.md §4; index.md:203-207
defers the numbers to the paper) — this tool makes that loop
self-contained for ANY of the 256px sample dumps (stackgan-2 sampling,
attngan sampling()'s single_samples dir, or an external real-image dir),
using the same Inception-v3 backbone as utils/metrics.py.

For numbers comparable across runs, point --image_encoder at the
published DAMSM image_encoder .pth (io/damsm_import) and, for IS,
$INCEPTION_V3_WEIGHTS at a torchvision inception_v3 state_dict (the
classifier head; utils/metrics.inception_score docstring).

Prints ONE JSON line:
  {"fid": F, "is_mean": M, "is_std": S, "n_real": NR, "n_fake": NF}

Usage: python tools/eval_fid.py REAL_DIR FAKE_DIR
           [--image_encoder damsm_image_encoder.pth] [--size 256]
           [--limit N] [--batch 32] [--out metrics.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def load_image_dir(path: str, size: int, limit: int = 0) -> np.ndarray:
    """All images under ``path`` (recursive, sorted) -> (N, size, size, 3)
    f32 in [-1, 1] (bilinear resize; the encoder re-resizes to 299)."""
    from PIL import Image

    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(path) for f in fs
        if f.lower().endswith(IMG_EXTS))
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    out = np.empty((len(files), size, size, 3), np.float32)
    for i, f in enumerate(files):
        img = Image.open(f).convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        out[i] = np.asarray(img, np.float32) / 127.5 - 1.0
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("real_dir")
    p.add_argument("fake_dir")
    p.add_argument("--image_encoder", default="",
                   help="DAMSM image_encoder .pth (random backbone if unset"
                        " — numbers then only comparable to themselves)")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--limit", type=int, default=0,
                   help="cap images read per dir (0 = all)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out", default="", help="also write JSON here")
    args = p.parse_args(argv)

    import jax

    from multiple_objects_gan_tpu.nn.encoders import CNNEncoder
    from multiple_objects_gan_tpu.utils.metrics import (
        compute_fid, inception_score)

    reals = load_image_dir(args.real_dir, args.size, args.limit)
    fakes = load_image_dir(args.fake_dir, args.size, args.limit)

    enc = CNNEncoder(nef=256)
    img = np.zeros((2, args.size, args.size, 3), np.float32)
    enc_vars = jax.jit(lambda r: enc.init(r, img, train=False))(
        jax.random.PRNGKey(0))
    if args.image_encoder:
        from multiple_objects_gan_tpu.io.damsm_import import (
            import_image_encoder)
        enc_vars = import_image_encoder(args.image_encoder, enc_vars)
        print(f"Load image encoder from: {args.image_encoder}", flush=True)
    else:
        print("WARNING: --image_encoder unset — random Inception backbone; "
              "FID comparable only within this configuration", flush=True)

    fid = compute_fid(enc, enc_vars, reals, fakes, args.batch)
    is_mean, is_std = inception_score(enc, enc_vars, fakes, args.batch)
    result = {"fid": round(fid, 4), "is_mean": round(is_mean, 4),
              "is_std": round(is_std, 4), "n_real": int(reals.shape[0]),
              "n_fake": int(fakes.shape[0])}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
