"""Standalone FID / Inception-Score eval between two image directories.

The reference computes FID/IS externally (SURVEY.md §4; index.md:203-207
defers the numbers to the paper) — this tool makes that loop
self-contained for ANY of the 256px sample dumps (stackgan-2 sampling,
attngan sampling()'s single_samples dir, or an external real-image dir),
using the same Inception-v3 backbone as utils/metrics.py.

For numbers comparable to the PUBLISHED FID, set $FID_INCEPTION_WEIGHTS
(or --fid_weights) to the pytorch-fid pt_inception-2015-12-05 .pth — the
canonical pool3 encoder (nn/fid_inception.py) is then used and
fid_encoder reports "fid_canonical". Otherwise --image_encoder selects
the DAMSM backbone ("damsm": self-consistent, not the published metric);
unset, a random backbone ("random": trend-only). For IS, point
$INCEPTION_V3_WEIGHTS at a torchvision inception_v3 state_dict (the
classifier head; utils/metrics.inception_score docstring).

Prints ONE JSON line:
  {"fid": F, "is_mean": M, "is_std": S, "n_real": NR, "n_fake": NF,
   "is_head": "imported"|"random", "is_backbone": "imported"|"random",
   "fid_encoder": "fid_canonical"|"damsm"|"random"}
IS is publication-grade only when is_backbone AND is_head are "imported"
(a warning prints otherwise).

Usage: python tools/eval_fid.py REAL_DIR FAKE_DIR
           [--fid_weights pt_inception.pth]
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


def list_image_files(path: str, limit: int = 0) -> list:
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(path) for f in fs
        if f.lower().endswith(IMG_EXTS))
    if limit:
        files = files[:limit]
    if not files:
        raise FileNotFoundError(f"no images under {path}")
    return files


def dir_activations(enc, enc_vars, path: str, size: int, limit: int,
                    batch: int, chunk: int = 512) -> np.ndarray:
    """Stream a directory into (N, 2048) Inception activations — at most
    ``chunk`` f32 frames live at once (a 30k-image 256px dir is ~24 GB as
    f32; the pooled features are ~250 MB)."""
    from PIL import Image

    from multiple_objects_gan_tpu.utils.metrics import inception_activations

    files = list_image_files(path, limit)
    acts = []
    for start in range(0, len(files), chunk):
        part = files[start:start + chunk]
        arr = np.empty((len(part), size, size, 3), np.float32)
        for i, f in enumerate(part):
            img = Image.open(f).convert("RGB")
            if img.size != (size, size):
                img = img.resize((size, size), Image.BILINEAR)
            arr[i] = np.asarray(img, np.float32) / 127.5 - 1.0
        acts.append(inception_activations(enc, enc_vars, arr, batch))
    return np.concatenate(acts, axis=0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("real_dir")
    p.add_argument("fake_dir")
    p.add_argument("--image_encoder", default="",
                   help="DAMSM image_encoder .pth (random backbone if unset"
                        " — numbers then only comparable to themselves)")
    p.add_argument("--fid_weights", default="",
                   help="pytorch-fid pt_inception .pth -> canonical FID "
                        "encoder (also honored via $FID_INCEPTION_WEIGHTS)")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--limit", type=int, default=0,
                   help="cap images read per dir (0 = all)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out", default="", help="also write JSON here")
    args = p.parse_args(argv)

    import jax

    from multiple_objects_gan_tpu.nn.encoders import CNNEncoder
    from multiple_objects_gan_tpu.utils.metrics import (
        fid_from_activations, inception_score, resolve_fid_encoder,
        resolve_inception_fc)

    enc = CNNEncoder(nef=256)
    img = np.zeros((2, args.size, args.size, 3), np.float32)
    enc_vars = jax.jit(lambda r: enc.init(r, img, train=False))(
        jax.random.PRNGKey(0))
    if args.image_encoder:
        from multiple_objects_gan_tpu.io.damsm_import import (
            import_image_encoder)
        enc_vars = import_image_encoder(args.image_encoder, enc_vars)
        print(f"Load image encoder from: {args.image_encoder}", flush=True)
    if args.fid_weights:
        os.environ["FID_INCEPTION_WEIGHTS"] = args.fid_weights
    fid_enc, fid_vars, fid_prov = resolve_fid_encoder(
        enc, enc_vars,
        provenance="damsm" if args.image_encoder else "random")
    if fid_prov == "fid_canonical":
        print(f"canonical pytorch-fid encoder: "
              f"{os.environ['FID_INCEPTION_WEIGHTS']}", flush=True)
    elif fid_prov == "random":
        print("WARNING: neither $FID_INCEPTION_WEIGHTS nor --image_encoder "
              "set — random Inception backbone; FID comparable only within "
              "this configuration", flush=True)

    real_acts = dir_activations(fid_enc, fid_vars, args.real_dir, args.size,
                                args.limit, args.batch)
    fake_acts = dir_activations(fid_enc, fid_vars, args.fake_dir, args.size,
                                args.limit, args.batch)
    fid = fid_from_activations(real_acts, fake_acts)
    fc, is_head = resolve_inception_fc()
    is_backbone = "imported" if args.image_encoder else "random"
    if is_backbone == "random" or is_head == "random":
        print("WARNING: IS is not comparable to published numbers "
              f"(backbone={is_backbone}, head={is_head}) — set "
              "--image_encoder AND $INCEPTION_V3_WEIGHTS for a meaningful "
              "IS", flush=True)
    if fid_prov == "fid_canonical" and is_backbone == "imported":
        # IS head weights match the torchvision/DAMSM backbone, not the
        # pt_inception pool — run IS on the DAMSM-backbone activations
        is_acts = dir_activations(enc, enc_vars, args.fake_dir, args.size,
                                  args.limit, args.batch)
    else:
        # reuse the FID activations: with a random backbone a second full
        # Inception sweep would only re-dress noise (provenance above says
        # so), and with a non-canonical FID encoder the backbones coincide
        is_acts = fake_acts
    is_mean, is_std = inception_score(enc, enc_vars, acts=is_acts,
                                      batch_size=args.batch, fc=fc)
    result = {"fid": round(fid, 4), "is_mean": round(is_mean, 4),
              "is_std": round(is_std, 4),
              "n_real": int(real_acts.shape[0]),
              "n_fake": int(fake_acts.shape[0]),
              "is_head": is_head, "is_backbone": is_backbone,
              "fid_encoder": fid_prov}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
