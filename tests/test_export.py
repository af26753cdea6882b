"""StableHLO export of the eval path (tools/export_model.py pattern):
serialize, deserialize, and run — proving the inference fn is a pure,
portable function of (params, inputs)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jexport

from multiple_objects_gan_tpu.models import common
from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
from multiple_objects_gan_tpu.train.step import create_state


def test_stablehlo_export_roundtrip():
    cfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=4)
    g = Stage1G(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, Stage1D(cfg), rng, batch_size=2)

    b, o = 2, cfg.num_objects
    z = jnp.zeros((b, cfg.z_dim))
    bbox = jnp.tile(jnp.array([0.2, 0.2, 0.4, 0.4]), (b, o, 1))
    labels = jnp.zeros((b, o, cfg.label_dim)).at[:, :, 1].set(1.0)

    def forward(g_params, g_stats, z, bbox, labels):
        out = g.apply({"params": g_params, "batch_stats": g_stats},
                      z, bbox, labels, None, train=False, ca_rng=None)
        return out["img"]

    args = (state.g_params, state.g_stats, z, bbox, labels)
    exported = jexport.export(jax.jit(forward))(*args)
    blob = exported.serialize()
    assert len(blob) > 1000

    back = jexport.deserialize(blob)
    img = back.call(*args)
    want = jax.jit(forward)(*args)
    np.testing.assert_allclose(np.asarray(img), np.asarray(want),
                               atol=1e-5)
