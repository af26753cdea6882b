"""Layout-fidelity eval of a trained G — the in-repo analog of the
paper's YOLOv3 placement check (ref index.md:205-207): per-label recall
of a crop classifier over STN-extracted bbox crops of GENERATED images
+ an IoU-style localization score (utils/layout_fidelity.py).

Usage:
  python tools/eval_layout_fidelity.py --ckpt TRAIN_OUTPUT_DIR \
      [--variant mnist|clevr] [--cfg cfg/mnist_train.yml] [--n 256]

Generates n images from fresh random layouts (never seen in training),
restores G (EMA-preferred) from the orbax run dir, and prints one JSON
line — mnist: {"recall", "per_label_recall", "loc_iou", "n_objects"};
clevr: {"recall_shape", "recall_color", "recall_both", "loc_iou",
"n_objects"}. A recall near chance (0.1 mnist digits; 1/3 shape, 1/8
color for clevr) means identity is not controlled by the label
conditioning; loc_iou near 0 means content ignores the boxes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--ckpt", required=True,
                   help="training output dir (orbax models/ inside)")
    p.add_argument("--variant", default="mnist",
                   choices=["mnist", "clevr"])
    p.add_argument("--cfg", default="",
                   help="default: cfg/{mnist,clevr}_train.yml per variant")
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multiple_objects_gan_tpu.config.config import (
        cfg_from_file, stage1_model_config)
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import (
        create_state, make_sample_fn)
    from multiple_objects_gan_tpu.utils import layout_fidelity as lf

    cfg_variant = {"mnist": "multi-mnist", "clevr": "clevr"}[args.variant]
    cfg_file = args.cfg or {"mnist": "cfg/mnist_train.yml",
                            "clevr": "cfg/clevr_train.yml"}[args.variant]
    cfg = cfg_from_file(cfg_file, cfg_variant)
    mcfg = stage1_model_config(cfg, cfg_variant)
    g = Stage1G(mcfg)
    rng = jax.random.PRNGKey(args.seed)
    state = create_state(mcfg, g, Stage1D(mcfg), rng, batch_size=2)
    mgr = CheckpointManager(os.path.join(args.ckpt, "models"))
    if mgr.latest_epoch() is None:
        raise SystemExit(f"no checkpoint under {args.ckpt}/models")
    state, epoch = mgr.restore(state)
    print(f"restored epoch {epoch} from {args.ckpt}", file=sys.stderr)
    # EMA params through the same eval path the sample CLI uses
    g_params = state.g_ema if state.g_ema is not None else state.g_params
    sample = make_sample_fn(mcfg, g)

    rs = np.random.RandomState(args.seed)
    if args.variant == "mnist":
        clf, score = lf.train_digit_classifier(seed=args.seed), \
            lf.layout_fidelity
    else:
        clf, score = lf.train_clevr_classifier(seed=args.seed), \
            lf.clevr_layout_fidelity
    n_obj = mcfg.num_objects
    imgs_all, bbox_all, lab_all = [], [], []
    for start in range(0, args.n, args.batch):
        b = min(args.batch, args.n - start)
        bbox = np.stack([rs.uniform(0.05, 0.6, (b, n_obj)),
                         rs.uniform(0.05, 0.6, (b, n_obj)),
                         rs.uniform(0.2, 0.33, (b, n_obj)),
                         rs.uniform(0.2, 0.33, (b, n_obj))], -1).astype(
                             np.float32)
        if args.variant == "mnist":
            labels = rs.randint(0, 10, (b, n_obj))
            cond = np.eye(10, dtype=np.float32)[labels]
        else:
            # two-hot dataset encoding: shape [0:3] + color [4:12]
            cond = np.zeros((b, n_obj, mcfg.label_dim), np.float32)
            ys = rs.randint(0, 3, (b, n_obj))
            yc = rs.randint(0, 8, (b, n_obj))
            for i in range(b):
                for j in range(n_obj):
                    cond[i, j, ys[i, j]] = 1.0
                    cond[i, j, 4 + yc[i, j]] = 1.0
            labels = cond
        text = (jnp.asarray(rs.randn(b, mcfg.text_dim).astype(np.float32))
                if mcfg.use_ca else None)
        z = jax.random.normal(jax.random.fold_in(rng, start),
                              (b, mcfg.z_dim))
        imgs = np.asarray(sample(g_params, state.g_stats, z,
                                 jnp.asarray(bbox), jnp.asarray(cond),
                                 text), np.float32)
        imgs_all.append(imgs)
        bbox_all.append(bbox)
        lab_all.append(labels)
    out = score(np.concatenate(imgs_all), np.concatenate(bbox_all),
                np.concatenate(lab_all), clf=clf)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
