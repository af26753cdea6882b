"""Unit tests for the learning-validation tool's pure helpers.

tools/validate_learning.py is the one-command train->restore->generate->
content-in-bbox check (driven on the real TPU); its measurement helpers
are pure NumPy and cheap to pin down here so a regression in the
measurement itself can't masquerade as a learning regression again
(see CLAUDE.md: the bf16 reduction artifact cost a debugging session).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from validate_learning import _random_layouts, _separation  # noqa: E402


def test_separation_bright_inside():
    # one image, one box covering the upper-left quadrant, bright inside
    imgs = np.full((1, 32, 32, 3), -1.0, np.float32)
    imgs[0, :16, :16, :] = 1.0
    bbox = np.full((1, 3, 4), -1.0, np.float32)
    bbox[0, 0] = [0.0, 0.0, 0.5, 0.5]
    in_box, out_box = _separation(imgs, bbox)
    assert in_box == 1.0
    assert out_box == -1.0


def test_separation_ignores_padded_boxes():
    # padded (-1) boxes must not contribute an "inside" region: image 0
    # carries a bright box, image 1 (all boxes padded) is all dark — if
    # padded boxes leaked into the mask, image 1's dark pixels would pull
    # in_box below 1.0; if image 0's box leaked onto image 1, out_box
    # would rise above the dark value
    imgs = np.full((2, 16, 16, 3), -1.0, np.float32)
    imgs[0, 4:12, 4:12, :] = 1.0           # exactly box [0.25,0.25,0.5,0.5]
    bbox = np.full((2, 4, 4), -1.0, np.float32)
    bbox[0, 0] = [0.25, 0.25, 0.5, 0.5]
    in_box, out_box = _separation(imgs, bbox)
    assert np.isclose(in_box, 1.0)
    assert np.isclose(out_box, -1.0)


def test_separation_uniform_image_is_zero():
    rs = np.random.RandomState(0)
    imgs = rs.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
    bbox, _, _ = _random_layouts(4, 3, 10, seed=1)
    in_box, out_box = _separation(imgs, bbox)
    # uniform noise: no separation beyond sampling error
    assert abs(in_box - out_box) < 0.05


def test_random_layouts_valid():
    b, o, ld = 16, 4, 13
    bbox, labels, rs = _random_layouts(b, o, ld, seed=7)
    assert bbox.shape == (b, o, 4) and labels.shape == (b, o, ld)
    active = bbox[..., 0] >= 0
    # every image has at least one active object
    assert active.any(axis=1).all()
    # active boxes stay inside [0, 1] and carry exactly one label
    x0, y0, w, h = (bbox[..., i] for i in range(4))
    assert ((x0 + w)[active] <= 1.0 + 1e-6).all()
    assert ((y0 + h)[active] <= 1.0 + 1e-6).all()
    assert (labels[active].sum(axis=-1) == 1.0).all()
    # padded rows are all -1 bbox and zero labels
    assert (labels[~active] == 0).all()
    assert (bbox[~active] == -1.0).all()


def test_attngan_validate_cfg_patch(tmp_path, monkeypatch):
    # the patched yml must zero LAMBDA and clear NET_E but keep the rest
    # of the reference schema loadable
    monkeypatch.chdir(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from validate_learning import _write_attngan_validate_cfg

    path = _write_attngan_validate_cfg(str(tmp_path))
    from multiple_objects_gan_tpu.config.config import cfg_from_file
    cfg = cfg_from_file(path, "coco-attngan")
    assert float(cfg.TRAIN.SMOOTH.LAMBDA) == 0.0
    assert cfg.TRAIN.NET_E == ""
    assert float(cfg.TRAIN.SMOOTH.GAMMA3) == 10.0


def test_trend_fid_discriminates():
    """The FID-trend encoder must actually SEPARATE distributions: a
    random-init DEEP backbone collapses every input to near-identical
    activations (measured FID ~6e-5 between white noise and dark images
    — the trend then reads 0.0 at every checkpoint and the check is
    vacuous). The shallow random-feature encoder must score a distant
    distribution far above a near-copy, and itself at ~0."""
    from validate_learning import _fid

    rs = np.random.RandomState(0)
    real = rs.rand(48, 64, 64, 3).astype(np.float32) * 2 - 1
    far = (rs.rand(48, 64, 64, 3).astype(np.float32) * 2 - 1) * 0.1 - 0.5
    near = real + rs.randn(48, 64, 64, 3).astype(np.float32) * 0.05

    f_far = _fid(real, far)
    f_near = _fid(real, near)
    f_self = _fid(real, real.copy())
    assert f_far > 100 * max(f_near, 1e-6)
    assert abs(f_self) < 1e-3
    # grayscale inputs route through the rgb() repeat
    g = real[..., :1]
    assert _fid(g, g.copy() * 0.2 - 0.5) > 1.0


def test_trend_encoder_contract_pinned():
    """CONTRACT PIN (VERDICT r3 next #8): the ROADMAP fid_trend numbers
    (mnist 39.9->0.34, clevr 37->0.6, stackgan-1 25->0.3, attngan
    29->1.5) are comparable ONLY under exactly this encoder architecture
    + seed. Checksums the PRNGKey(0) parameters AND a feature vector on a
    fixed input; if you change make_trend_encoder, re-measure the pinned
    numbers on TPU and update BOTH ROADMAP and these constants."""
    import jax
    import jax.numpy as jnp

    from validate_learning import make_trend_encoder

    enc_vars, feat = make_trend_encoder(64)
    leaves = jax.tree_util.tree_leaves(enc_vars)
    assert sum(l.size for l in leaves) == 165600
    param_abs_sum = float(sum(float(jnp.sum(jnp.abs(l))) for l in leaves))
    np.testing.assert_allclose(param_abs_sum, 4605.043594360352, rtol=1e-5)

    rs = np.random.RandomState(42)
    x = jnp.asarray(rs.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    f = np.asarray(feat(enc_vars, x))
    assert f.shape == (2, 448)
    np.testing.assert_allclose(float(np.abs(f).sum()), 144.34774780273438,
                               rtol=1e-4)
    np.testing.assert_allclose(
        f[0, :4],
        [0.17380394041538239, 0.15794917941093445,
         0.16780903935432434, 0.1698075830936432], rtol=1e-4)


def test_fid_decreasing_verdict():
    """The learning verdict over the FID trend: all four recorded
    convergence-run trends (ROADMAP "Convergence runs") must pass —
    including stackgan-2's floor noise (0.12 -> 0.18 after a 26.73
    init), which a bare final<=min*1.10 ratio wrongly failed — while
    flat (never-learned), rising, and genuinely regressed trends fail."""
    from validate_learning import fid_decreasing

    assert fid_decreasing([39.86, 0.37, 0.37])      # mnist r4
    assert fid_decreasing([37.00, 0.37, 0.38])      # clevr r4
    assert fid_decreasing([24.99, 0.08, 0.09])      # stackgan-1 r4
    assert fid_decreasing([26.73, 0.12, 0.18])      # stackgan-2 r4 floor
    assert not fid_decreasing([5.0, 5.0, 5.0])      # never learned
    assert not fid_decreasing([5.0, 6.0, 7.0])      # diverging
    assert not fid_decreasing([30.0, 0.5, 12.0])    # learned then broke


def test_export_frozen_s1_roundtrip(tmp_path):
    """--export_pth on coco-stackgan-2 embeds the run's frozen STAGE1_G.
    The helper re-derives it from the seed (same create_state rng order
    as cli/stage2_runner.run_stage2), so the exported .pth must re-import
    to EXACTLY the deterministic state — pinned here at small width so a
    drift in either the rng order or the export/import key mapping fails
    loudly rather than silently embedding the wrong frozen stage-1."""
    import jax

    from validate_learning import _export_frozen_s1

    from multiple_objects_gan_tpu.config.config import (
        cfg_from_file, stage1_model_config)
    from multiple_objects_gan_tpu.io.torch_import import (
        import_stage1_g, load_torch_checkpoint)
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import create_state

    with open(os.path.join("cfg", "coco_s2_train.yml")) as f:
        yml = f.read()
    yml = (yml.replace("GF_DIM: 192", "GF_DIM: 16")
              .replace("DF_DIM: 96", "DF_DIM: 8")
              .replace("CONDITION_DIM: 128", "CONDITION_DIM: 16")
              .replace("DIMENSION: 1024", "DIMENSION: 32"))
    cfg_file = tmp_path / "s2_small.yml"
    cfg_file.write_text(yml)

    pth = _export_frozen_s1(str(cfg_file), 7, str(tmp_path / "s1.pth"))

    cfg = cfg_from_file(str(cfg_file), "coco-stackgan")
    s1_cfg = stage1_model_config(cfg, "coco-stackgan")
    want = create_state(s1_cfg, Stage1G(s1_cfg), Stage1D(s1_cfg),
                        jax.random.PRNGKey(7), batch_size=2)
    params, stats = import_stage1_g(load_torch_checkpoint(pth), s1_cfg)
    for got_t, want_t in ((params, want.g_params), (stats, want.g_stats)):
        got_l = jax.tree_util.tree_leaves_with_path(got_t)
        want_l = jax.tree_util.tree_leaves_with_path(want_t)
        assert [k for k, _ in got_l] == [k for k, _ in want_l]
        for (k, g), (_, w) in zip(got_l, want_l):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                          err_msg=str(k))


def test_random_layouts_clevr_two_hot():
    """clevr eval layouts must match the TRAINING label distribution
    (data/datasets.py:163-169): exactly one shape hot in [0:3] AND one
    color hot in [4:12], slot 3 and the pad slot 12 never set — the old
    single-random-hot labels were off-distribution (could even condition
    an object on the pad class)."""
    import sys as _sys

    _sys.path.insert(0, "tools")
    from validate_learning import _random_layouts

    bbox, labels, _ = _random_layouts(32, 4, 13, seed=3, clevr=True)
    valid = bbox[..., 2] > 0
    assert valid.any()
    shape = labels[..., 0:3]
    color = labels[..., 4:12]
    np.testing.assert_array_equal(shape.sum(-1)[valid], 1.0)
    np.testing.assert_array_equal(color.sum(-1)[valid], 1.0)
    assert labels[..., 3].sum() == 0 and labels[..., 12].sum() == 0
    assert labels[~valid].sum() == 0
    # mnist mode unchanged: single hot among the first n_classes
    _, lab_m, _ = _random_layouts(8, 3, 10, seed=3, n_classes=10)
    assert set(np.unique(lab_m.sum(-1))) <= {0.0, 1.0}
