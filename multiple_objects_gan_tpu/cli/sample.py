"""Sampling / evaluation paths for the stage-1 variants.

Parity target: GANTrainer.sample (code/multi-mnist/trainer.py:208-342 and
code/clevr/trainer.py:203-301): load G, pick random test layouts, render 9
variations per scene plus the real image, draw bbox rectangles, add a
caption-text tile, save 20-tile grids. Layout surgery options
(num_digits_per_img, change_bbox_size) are supported for multi-mnist.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.train.step import create_state, make_sample_fn
from multiple_objects_gan_tpu.utils.images import (
    caption_tile,
    draw_bboxes,
    make_grid,
    save_grid,
    to_uint8,
)

CLEVR_SHAPE_NAMES = {0: "cube", 1: "cylinder", 2: "sphere"}
CLEVR_COLOR_NAMES = {0: "gray", 1: "red", 2: "blue", 3: "green", 4: "brown",
                     5: "purple", 6: "cyan", 7: "yellow"}


def load_validation_layouts(datapath: str):
    """labels/bboxes pickles (code/multi-mnist/miscc/utils.py:59-68)."""
    with open(os.path.join(datapath, "normal", "bboxes.pickle"), "rb") as f:
        bboxes = np.array(pickle.load(f), np.float32)
    with open(os.path.join(datapath, "normal", "labels.pickle"), "rb") as f:
        labels = np.array(pickle.load(f), np.float32)
    return labels, bboxes


def sample_stage1(args, cfg, mcfg, g_module, output_dir: str,
                  variant: str, seed: int, num_samples: int = 25,
                  draw_bbox: bool = True,
                  num_objects_override: Optional[int] = None,
                  change_bbox_size: Optional[float] = None,
                  state=None) -> str:
    """Generate qualitative grids. Returns the directory written to."""
    import os as _os

    rng = jax.random.PRNGKey(seed)
    if state is None:
        from multiple_objects_gan_tpu.io.torch_import import (
            maybe_load_reference_g)
        state = create_state(mcfg, g_module, _dummy_d(mcfg), rng)
        net_g = cfg.get("NET_G", "")
        if net_g and _os.path.isdir(net_g):
            # an output dir of our own training -> orbax restore
            from multiple_objects_gan_tpu.io.checkpoint import (
                CheckpointManager)
            mgr = CheckpointManager(_os.path.join(net_g, "models"))
            if mgr.latest_epoch() is not None:
                state, ep = mgr.restore(state)
                print(f"restored G from {net_g} (epoch {ep})", flush=True)
        else:
            loaded = maybe_load_reference_g(net_g, mcfg, state)
            if loaded is not None:
                state = loaded
            else:
                print(f"WARNING: NET_G={net_g!r} not found — sampling from "
                      "randomly initialized weights", flush=True)
    sample_fn = make_sample_fn(mcfg, g_module)

    datapath = os.path.join(cfg.DATA_DIR, "test")
    labels, bboxes = load_validation_layouts(datapath)
    rnd = np.random.RandomState(seed)
    out_dir = os.path.join(output_dir, "samples")
    os.makedirs(out_dir, exist_ok=True)

    n_var = 9
    for s in range(num_samples):
        idx = rnd.randint(len(labels))
        lab = labels[idx].copy()
        bb = bboxes[idx].copy()
        if num_objects_override is not None:
            lab, bb = _layout_surgery(lab, bb, num_objects_override, rnd,
                                      mcfg.label_dim)
        if change_bbox_size is not None:
            bb[:, 2:] = np.clip(bb[:, 2:] * change_bbox_size, 0.05, 1.0)
        lab_t = jnp.asarray(np.tile(lab[None], (n_var, 1, 1)))
        bb_t = jnp.asarray(np.tile(bb[None], (n_var, 1, 1)))
        z = jax.random.normal(jax.random.fold_in(rng, s),
                              (n_var, mcfg.z_dim))
        fakes = np.asarray(sample_fn(state.g_params, state.g_stats, z,
                                     bb_t, lab_t, None))
        tiles = [to_uint8(f) for f in fakes]
        if draw_bbox:
            tiles = [draw_bboxes(t, bb) for t in tiles]
        caption = _caption_lines(lab, variant)
        tiles.append(caption_tile(caption, tiles[0].shape[:2]))
        grid = make_grid(np.stack([t / 127.5 - 1.0 for t in tiles]), nrow=5)
        from PIL import Image
        Image.fromarray(grid).save(os.path.join(out_dir, f"sample_{s:03d}.png"))
    print(f"wrote {num_samples} sample grids to {out_dir}")
    return out_dir


def _dummy_d(mcfg):
    from multiple_objects_gan_tpu.models.stage1 import Stage1D
    return Stage1D(mcfg)


def _layout_surgery(lab, bb, n_objects, rnd, label_dim):
    """Fewer/more objects than trained with (trainer.py:219-243)."""
    cur = lab.shape[0]
    if n_objects <= cur:
        return lab[:n_objects], bb[:n_objects]
    extra = n_objects - cur
    new_lab = np.zeros((extra, label_dim), np.float32)
    new_lab[np.arange(extra), rnd.randint(0, label_dim, extra)] = 1.0
    new_bb = np.stack([
        rnd.uniform(0.0, 0.7, extra), rnd.uniform(0.0, 0.7, extra),
        rnd.uniform(0.15, 0.3, extra), rnd.uniform(0.15, 0.3, extra)],
        axis=-1).astype(np.float32)
    return (np.concatenate([lab, new_lab]), np.concatenate([bb, new_bb]))


def _caption_lines(lab, variant):
    if variant == "multi-mnist":
        return [str(int(np.argmax(l))) for l in lab if l.max() > 0]
    if variant == "clevr":
        lines = []
        for l in lab:
            if l.max() <= 0:
                continue
            lines.append(f"{CLEVR_COLOR_NAMES.get(int(np.argmax(l[4:])), '?')} "
                         f"{CLEVR_SHAPE_NAMES.get(int(np.argmax(l[:4])), '?')}")
        return lines
    return [f"label {int(np.argmax(l))}" for l in lab if l.max() > 0]
