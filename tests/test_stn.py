"""STN core-op tests.

Golden parity is checked against torch.nn.functional.affine_grid/grid_sample
with align_corners=True + zero padding — the PyTorch-0.4-era semantics the
reference relies on (code/multi-mnist/model.py:73-77). Torch runs on CPU and
is used ONLY as a test oracle.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multiple_objects_gan_tpu.ops import (
    affine_grid,
    grid_sample,
    stn,
    stn_extract,
    stn_extract_multi,
    stn_place,
    stn_place_multi,
    stn_place_const_multi,
    stn_separable,
    transformation_matrix,
    transformation_matrix_inverse,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_bbox(rng, b):
    x = rng.uniform(0.05, 0.6, size=(b,))
    y = rng.uniform(0.05, 0.6, size=(b,))
    w = rng.uniform(0.15, 0.35, size=(b,))
    h = rng.uniform(0.15, 0.35, size=(b,))
    return np.stack([x, y, w, h], axis=-1).astype(np.float32)


def _torch_stn(img_nchw, theta, out_hw):
    size = (img_nchw.shape[0], img_nchw.shape[1], out_hw[0], out_hw[1])
    grid = F.affine_grid(torch.from_numpy(theta), size, align_corners=True)
    out = F.grid_sample(
        torch.from_numpy(img_nchw), grid, mode="bilinear",
        padding_mode="zeros", align_corners=True)
    return out.numpy()


def test_matrix_formulas_golden():
    # hand-computed from miscc/utils.py:18-51
    bbox = jnp.array([[0.25, 0.5, 0.5, 0.25]])
    m = transformation_matrix(bbox)[0]
    np.testing.assert_allclose(
        np.asarray(m),
        [[0.5, 0.0, 2 * ((0.25 + 0.25) - 0.5)],
         [0.0, 0.25, 2 * ((0.5 + 0.125) - 0.5)]], atol=1e-6)
    mi = transformation_matrix_inverse(bbox)[0]
    np.testing.assert_allclose(
        np.asarray(mi),
        [[2.0, 0.0, 2 * 2.0 * (0.5 - 0.5)],
         [0.0, 4.0, 2 * 4.0 * (0.5 - 0.625)]], atol=1e-6)


def test_matrices_are_mutual_inverses():
    rng = np.random.RandomState(0)
    bbox = jnp.asarray(_rand_bbox(rng, 16))
    fwd = transformation_matrix(bbox)
    inv = transformation_matrix_inverse(bbox)
    # compose as full 3x3
    def to3(m):
        pad = jnp.tile(jnp.array([[[0.0, 0.0, 1.0]]]), (m.shape[0], 1, 1))
        return jnp.concatenate([m, pad], axis=1)
    comp = jnp.einsum("bij,bjk->bik", to3(fwd), to3(inv))
    np.testing.assert_allclose(np.asarray(comp), np.tile(np.eye(3), (16, 1, 1)),
                               atol=1e-2)  # f32 (1/w)*w roundoff


@pytest.mark.parametrize("out_hw", [(16, 16), (16, 12), (64, 64)])
def test_grid_sample_parity_with_torch(out_hw):
    rng = np.random.RandomState(1)
    b, h, w, c = 4, 16, 16, 3
    img = rng.randn(b, h, w, c).astype(np.float32)
    bbox = _rand_bbox(rng, b)
    for theta_np in (np.asarray(transformation_matrix(jnp.asarray(bbox))),
                     np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))):
        want = _torch_stn(img.transpose(0, 3, 1, 2), theta_np, out_hw)
        got = stn(jnp.asarray(img), jnp.asarray(theta_np), out_hw)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


@pytest.mark.parametrize("out_hw", [(16, 16), (31, 17), (64, 64)])
def test_separable_matches_general_and_torch(out_hw):
    rng = np.random.RandomState(2)
    b, h, w, c = 4, 15, 16, 2  # odd size on purpose
    img = rng.randn(b, h, w, c).astype(np.float32)
    bbox = _rand_bbox(rng, b)
    theta = transformation_matrix_inverse(jnp.asarray(bbox))
    got_sep = stn_separable(jnp.asarray(img), theta, out_hw)
    got_gen = stn(jnp.asarray(img), theta, out_hw)
    np.testing.assert_allclose(np.asarray(got_sep), np.asarray(got_gen), atol=1e-4)
    want = _torch_stn(img.transpose(0, 3, 1, 2), np.asarray(theta), out_hw)
    np.testing.assert_allclose(
        np.asarray(got_sep).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_padded_bbox_minus_one_gives_zero_output():
    """bbox = -1 padding must produce an all-zero placed map (the reference's
    'empty object' trick — clevr datasets.py pads bboxes with -1)."""
    img = jnp.ones((2, 8, 8, 4))
    bbox = jnp.full((2, 4), -1.0)
    out = stn_place(img, bbox, (16, 16))
    np.testing.assert_allclose(np.asarray(out), 0.0)
    out2 = stn_extract(img, bbox, (16, 16))
    np.testing.assert_allclose(np.asarray(out2), 0.0)


def test_place_extract_roundtrip():
    """Place a feature map into a grid-aligned bbox then extract it back."""
    rng = np.random.RandomState(3)
    feat = rng.randn(1, 16, 16, 3).astype(np.float32)
    # bbox aligned to the 64-grid so bilinear resampling is exact
    bbox = jnp.array([[16 / 64, 16 / 64, 16 / 64, 16 / 64]])
    canvas = stn_place(jnp.asarray(feat), bbox, (64, 64))
    # canvas nonzero only inside bbox
    mask = np.zeros((64, 64), bool)
    np_canvas = np.asarray(canvas[0, :, :, 0])
    assert (np.abs(np_canvas) > 1e-6).sum() > 0
    mask[15:33, 15:33] = True  # bilinear support slightly exceeds the box
    assert np.all(np.abs(np_canvas[~mask]) < 1e-5)
    back = stn_extract(canvas, bbox, (16, 16))
    # roundtrip matches torch doing the identical place+extract composition
    # (align_corners resampling is not an exact inverse; torch is the oracle)
    theta_inv = np.asarray(transformation_matrix_inverse(bbox))
    theta_fwd = np.asarray(transformation_matrix(bbox))
    t_canvas = _torch_stn(feat.transpose(0, 3, 1, 2), theta_inv, (64, 64))
    t_back = _torch_stn(t_canvas, theta_fwd, (16, 16))
    np.testing.assert_allclose(np.asarray(back).transpose(0, 3, 1, 2),
                               t_back, atol=1e-4)


def test_multi_object_place_matches_loop():
    rng = np.random.RandomState(4)
    b, o = 3, 4
    feats = rng.randn(b, o, 8, 8, 5).astype(np.float32)
    bbox = _rand_bbox(rng, b * o).reshape(b, o, 4)
    got = stn_place_multi(jnp.asarray(feats), jnp.asarray(bbox), (16, 16))
    want = sum(
        np.asarray(stn_place(jnp.asarray(feats[:, i]), jnp.asarray(bbox[:, i]),
                             (16, 16)))
        for i in range(o))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_multi_object_extract_shape():
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    bbox = jnp.asarray(_rand_bbox(rng, 6).reshape(2, 3, 4))
    out = stn_extract_multi(img, bbox, (16, 16))
    assert out.shape == (2, 3, 16, 16, 3)
    one = stn_extract(img, bbox[:, 1], (16, 16))
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(one), atol=1e-5)


def test_affine_grid_parity_with_torch():
    rng = np.random.RandomState(6)
    theta = np.asarray(
        transformation_matrix(jnp.asarray(_rand_bbox(rng, 5))))
    want = F.affine_grid(torch.from_numpy(theta), (5, 3, 9, 7),
                         align_corners=True).numpy()
    got = np.asarray(affine_grid(jnp.asarray(theta), (9, 7)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grads_flow_through_separable():
    import jax
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    bbox = jnp.asarray(_rand_bbox(rng, 2))
    g = jax.grad(lambda im: stn_place(im, bbox, (16, 16)).sum())(img)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_bf16_resample_close_to_f32():
    """The dtype-driven bf16 training path (mixed-precision resampling on
    the MXU) stays within bf16 rounding of the f32/HIGHEST parity path;
    output dtype follows the input dtype."""
    rng = np.random.RandomState(8)
    feats = rng.randn(2, 3, 8, 8, 5).astype(np.float32)
    bbox = jnp.asarray(_rand_bbox(rng, 6).reshape(2, 3, 4))
    f32 = np.asarray(stn_place_multi(jnp.asarray(feats), bbox, (16, 16)))
    b16 = np.asarray(stn_place_multi(
        jnp.asarray(feats, jnp.bfloat16), bbox, (16, 16)).astype(jnp.float32))
    assert np.abs(b16 - f32).max() < 0.05  # ~bf16 eps * |sum of 3 objects|

    labels = rng.randn(2, 3, 7).astype(np.float32)
    f32c = np.asarray(stn_place_const_multi(jnp.asarray(labels), bbox,
                                            (16, 16)))
    b16c = np.asarray(stn_place_const_multi(
        jnp.asarray(labels, jnp.bfloat16), bbox,
        (16, 16)).astype(jnp.float32))
    assert np.abs(b16c - f32c).max() < 0.05
