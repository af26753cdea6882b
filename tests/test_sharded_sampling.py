"""Distributed bulk sampling: the eval/generation path is embarrassingly
data-parallel — sharded conditioning + replicated weights through the
SAME sample jit must equal single-device generation (eval-mode BN has no
cross-sample reductions, so the partitioning is collective-free).

The reference samples on one GPU (code/coco/attngan/trainer.py:387-472);
here a 30k-image FID dump rides the whole mesh (cli/attngan_runner.py:
sampling sharding block).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
from multiple_objects_gan_tpu.models import common
from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
from multiple_objects_gan_tpu.parallel import mesh as pmesh
from multiple_objects_gan_tpu.train.step import create_state, make_sample_fn


def test_sharded_sampling_matches_single_device():
    cfg = dataclasses.replace(common.MNIST, gf_dim=16, df_dim=8)
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, d, rng, batch_size=2)
    b = 16
    batch = synthetic_batch(cfg, b)
    z = np.asarray(jax.random.normal(rng, (b, cfg.z_dim)))
    sample = make_sample_fn(cfg, g)

    single = np.asarray(sample(state.g_params, state.g_stats,
                               jnp.asarray(z), jnp.asarray(batch["bbox"]),
                               jnp.asarray(batch["label_onehot"]), None))

    mesh = pmesh.make_mesh(8)
    state_r = pmesh.replicate_state(mesh, state)
    sh = pmesh.shard_batch(mesh, {"z": z, "bbox": batch["bbox"],
                                  "labels": batch["label_onehot"]})
    out = sample(state_r.g_params, state_r.g_stats, sh["z"], sh["bbox"],
                 sh["labels"], None)
    # the output inherits the data sharding — generation actually ran
    # split across the 8 devices
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), single, atol=2e-5)
