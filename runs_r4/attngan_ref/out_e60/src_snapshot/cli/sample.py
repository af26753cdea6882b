"""Sampling / evaluation paths for the stage-1 variants.

Parity target: GANTrainer.sample (code/multi-mnist/trainer.py:208-342 and
code/clevr/trainer.py:203-301): load G, pick random test layouts, render 9
variations per scene plus the real image, draw bbox rectangles, add a
caption-text tile, save 20-tile grids. Layout surgery options
(num_digits_per_img, change_bbox_size) are supported for multi-mnist.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multiple_objects_gan_tpu.train.step import create_state, make_sample_fn
from multiple_objects_gan_tpu.utils.images import as_model_image, save_grid

CLEVR_SHAPE_NAMES = {0: "cube", 1: "cylinder", 2: "sphere"}
CLEVR_COLOR_NAMES = {0: "gray", 1: "red", 2: "blue", 3: "green", 4: "brown",
                     5: "purple", 6: "cyan", 7: "yellow"}


def load_validation_layouts(datapath: str):
    """labels/bboxes pickles (code/multi-mnist/miscc/utils.py:59-68);
    load_pickle handles the published py2-cPickle files."""
    from multiple_objects_gan_tpu.io.pycompat import load_pickle

    bboxes = np.array(
        load_pickle(os.path.join(datapath, "normal", "bboxes.pickle")),
        np.float32)
    labels = np.array(
        load_pickle(os.path.join(datapath, "normal", "labels.pickle")),
        np.float32)
    return labels, bboxes


def sample_stage1(args, cfg, mcfg, g_module, output_dir: str,
                  variant: str, seed: int, num_samples: int = 25,
                  draw_bbox: bool = True,
                  num_objects_override: Optional[int] = None,
                  change_bbox_size: Optional[float] = None,
                  state=None) -> str:
    """Generate qualitative grids. Returns the directory written to."""
    # layout-surgery knobs: CLI flags override the kwargs (the reference
    # exposes these only as code-edited parameters, trainer.py:219-253)
    if getattr(args, "num_objects", None) is not None:
        num_objects_override = args.num_objects
    if getattr(args, "bbox_scale", None) is not None:
        change_bbox_size = args.bbox_scale

    rng = jax.random.PRNGKey(seed)
    if state is None:
        from multiple_objects_gan_tpu.io.torch_import import (
            maybe_load_reference_g)
        state = create_state(mcfg, g_module, _dummy_d(mcfg), rng)
        net_g = cfg.get("NET_G", "")
        if net_g and os.path.isdir(net_g):
            # an output dir of our own training -> orbax restore
            from multiple_objects_gan_tpu.io.checkpoint import (
                CheckpointManager)
            mgr = CheckpointManager(os.path.join(net_g, "models"))
            if mgr.latest_epoch() is not None:
                state, ep = mgr.restore(state)
                print(f"restored G from {net_g} (epoch {ep})", flush=True)
            else:
                print(f"WARNING: NET_G dir {net_g!r} holds no checkpoint — "
                      "sampling from randomly initialized weights",
                      flush=True)
        else:
            loaded = maybe_load_reference_g(net_g, mcfg, state)
            if loaded is not None:
                state = loaded
            else:
                print(f"WARNING: NET_G={net_g!r} not found — sampling from "
                      "randomly initialized weights", flush=True)
    sample_fn = make_sample_fn(mcfg, g_module)

    # real test items come from the dataset (image + layout), matching the
    # reference's val_image tile (trainer.py:286-292; clevr iterates the
    # test loader, trainer.py:220-236)
    if variant == "clevr":
        from multiple_objects_gan_tpu.data.datasets import ClevrDataset
        ds = ClevrDataset(cfg.DATA_DIR, split="test",
                          imsize=int(cfg.IMSIZE), hflip=False, seed=seed)
    else:
        from multiple_objects_gan_tpu.data.datasets import MultiMnistDataset
        ds = MultiMnistDataset(cfg.DATA_DIR, split="test")
    rnd = np.random.RandomState(seed)
    out_dir = os.path.join(output_dir, "samples")
    os.makedirs(out_dir, exist_ok=True)

    n_var = 9
    for s in range(num_samples):
        item = ds[rnd.randint(len(ds))]
        lab = item["label_onehot"].copy()
        bb = item["bbox"].copy()
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
        imsize = fakes.shape[1]

        # 20-tile composition (trainer.py:307-341): row 1 = real + 9 fakes
        # with white bbox edges, row 2 = the caption text strip chunked
        # into 10 tiles; saved with nrow=10.
        tiles = np.concatenate([as_model_image(item["image"])[None],
                                fakes], axis=0)         # (10, H, W, C)
        if tiles.shape[-1] == 1:
            tiles = np.repeat(tiles, 3, axis=-1)
        if draw_bbox:
            _draw_white_bbox_edges(tiles, bb, imsize)
        text_tiles = _text_tiles(_caption_lines(lab, variant), imsize)
        grid20 = np.concatenate([tiles, text_tiles], axis=0)  # (20, H, W, 3)
        save_grid(grid20, os.path.join(out_dir, f"sample_{s:03d}.png"),
                  nrow=10)
    print(f"wrote {num_samples} sample grids to {out_dir}")
    return out_dir


def _draw_white_bbox_edges(tiles: np.ndarray, bb: np.ndarray,
                           imsize: int) -> None:
    """White 1-px rectangle edges on every tile, in place
    (trainer.py:313-327 — value 1.0 == white after [-1, 1] mapping)."""
    for bbv in np.asarray(bb).reshape(-1, 4):
        x, y = int(imsize * bbv[0]), int(imsize * bbv[1])
        w = min(int(imsize * bbv[2]), imsize - 1)
        h = min(int(imsize * bbv[3]), imsize - 1)
        while x + w >= imsize:
            x -= 1
            w -= 1
        while y + h >= imsize:
            y -= 1
            h -= 1
        if x <= -1:
            continue  # pad row (bbox -1) — layout surgery can leave pads
                      # mid-array, so skip rather than stop
        tiles[:, y, x:x + w] = 1.0
        tiles[:, y:y + h, x] = 1.0
        tiles[:, y + h, x:x + w] = 1.0
        tiles[:, y:y + h, x + w] = 1.0


def _text_tiles(lines, imsize: int) -> np.ndarray:
    """(10, imsize, imsize, 3) caption-text row in [-1, 1]: one white
    strip with the labels, chunked into 10 tiles (trainer.py:330-340)."""
    from PIL import Image, ImageDraw

    strip = Image.new("RGB", (imsize * 10, imsize), (255, 255, 255))
    ImageDraw.Draw(strip).text((10, 10), ", ".join(lines), fill=(0, 0, 0))
    arr = np.asarray(strip, np.float32) / 127.5 - 1.0
    return np.stack([arr[:, i * imsize:(i + 1) * imsize]
                     for i in range(10)])


def _dummy_d(mcfg):
    from multiple_objects_gan_tpu.models.stage1 import Stage1D
    return Stage1D(mcfg)


def _layout_surgery(lab, bb, n_objects, rnd, label_dim):
    """Fewer/more objects than trained with (trainer.py:219-243)."""
    # operate on REAL objects only: clevr items carry -1-padded rows, and
    # truncating/appending around pads would keep pad rows or hide new
    # objects behind them
    valid = bb[:, 0] >= 0
    lab, bb = lab[valid], bb[valid]
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
            # skip absent objects: all-zero rows (layout surgery) or the
            # reference's pad one-hots (shape slot 3 / color slot 8 —
            # datasets.py label_one_hot, labels[labels < 0] = dim-1)
            if l.max() <= 0 or int(np.argmax(l[:4])) == 3:
                continue
            lines.append(f"{CLEVR_COLOR_NAMES.get(int(np.argmax(l[4:])), '?')} "
                         f"{CLEVR_SHAPE_NAMES.get(int(np.argmax(l[:4])), '?')}")
        return lines
    return [f"label {int(np.argmax(l))}" for l in lab if l.max() > 0]
