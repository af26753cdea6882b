"""UpConv3x3 phase decomposition == upsample_nearest_2x + 3x3 conv, exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from multiple_objects_gan_tpu.nn.blocks import (
    Conv3x3, UpConv3x3, upsample_nearest_2x)


def test_upconv_matches_naive_path():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 7, 5).astype(np.float32))

    up = UpConv3x3(6)
    variables = up.init(jax.random.PRNGKey(0), x)
    got = up.apply(variables, x)

    conv = Conv3x3(6)
    # same param tree: {Conv_0: {kernel}}
    naive = conv.apply({"params": variables["params"]},
                       upsample_nearest_2x(x))
    assert got.shape == naive.shape == (2, 18, 14, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive),
                               atol=2e-5)


def test_upconv_large_map_branch_matches():
    """Outputs > phase_max_out route through the naive upsample+conv
    branch — identical results either way."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 40, 40, 4).astype(np.float32))
    up = UpConv3x3(3)
    variables = up.init(jax.random.PRNGKey(0), x)
    got = up.apply(variables, x)                       # 80 > 64 -> naive
    forced = UpConv3x3(3, phase_max_out=1024)
    phase = forced.apply(variables, x)                 # phase path
    naive = Conv3x3(3).apply({"params": variables["params"]},
                             upsample_nearest_2x(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(naive),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(phase), np.asarray(naive),
                               atol=2e-5)
