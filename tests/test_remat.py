"""MOG_REMAT policies: pure performance knobs — results must be EXACT.

jax.checkpoint only changes WHEN activations are (re)computed, never
what; a remat mode that changed losses or updates would silently alter
training. Runs a tiny mnist train step under every mode and asserts
metrics + updated params match the no-remat baseline bitwise-close.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_step(monkeypatch, mode: str):
    from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
    from multiple_objects_gan_tpu.models import common
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import (
        create_state, make_train_step)

    monkeypatch.setenv("MOG_REMAT", mode)
    cfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=4)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, d, rng, batch_size=2)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, 4).items()}
    # fresh jit per mode: the knob is read at trace time
    step = jax.jit(make_train_step(cfg, g, d))
    new_state, metrics = step(state, batch, rng, jnp.float32(2e-4),
                              jnp.float32(2e-4))
    return ({k: float(v) for k, v in metrics.items()},
            jax.device_get(new_state.g_params))


@pytest.fixture(scope="module")
def baseline():
    """One no-remat baseline for all modes: the suite is compile-bound
    (CLAUDE.md) and the baseline trace is identical across parametrizations."""
    mp = pytest.MonkeyPatch()
    try:
        yield _tiny_step(mp, "0")
    finally:
        mp.undo()


@pytest.mark.parametrize("mode", ["full", "convs", "dots"])
def test_remat_modes_match_baseline(monkeypatch, baseline, mode):
    base_metrics, base_params = baseline
    got_metrics, got_params = _tiny_step(monkeypatch, mode)
    assert set(got_metrics) == set(base_metrics)
    for k in base_metrics:
        np.testing.assert_allclose(got_metrics[k], base_metrics[k],
                                   rtol=1e-5, err_msg=f"{mode}:{k}")
    for a, b in zip(jax.tree.leaves(base_params),
                    jax.tree.leaves(got_params)):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_remat_bad_mode_raises(monkeypatch):
    from multiple_objects_gan_tpu.train.step import maybe_remat

    monkeypatch.setenv("MOG_REMAT", "bogus")
    with pytest.raises(ValueError, match="bogus"):
        maybe_remat(lambda x: x)
