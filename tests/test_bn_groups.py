"""Per-replica BatchNorm (BN_GROUPS) == nn.parallel.data_parallel oracle.

The reference's multi-GPU runs compute BN statistics per GPU shard
(DataParallel scatters the batch contiguously; every loss call site wraps
the forward, code/multi-mnist/trainer.py:42-46). The TPU default is
global-batch sync-BN (nn/blocks.py header); ``set_bn_groups(G)`` opts into
the faithful per-replica semantics. DataParallel over G GPUs on batch B is
EXACTLY: split B into G contiguous chunks, run each chunk independently
(own BN stats), concat — and the master module keeps only replica 0's
running-stat update. These tests assert that equivalence directly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiple_objects_gan_tpu.models import common
from multiple_objects_gan_tpu.models.stage1 import Stage1G
from multiple_objects_gan_tpu.nn import blocks


@pytest.fixture
def bn_groups_2(monkeypatch):
    monkeypatch.setattr(blocks, "BN_GROUPS", 2)


def test_grouped_bn_matches_split_forward(bn_groups_2):
    """One grouped layer forward == concat of two independent sync-BN
    forwards on the contiguous halves; running stats keep only group 0's
    update (replica 0 is the master module in DataParallel)."""
    bn = blocks.TorchBatchNorm()
    rng = np.random.RandomState(0)
    x = rng.randn(8, 4, 4, 3).astype(np.float32) * 2.0 + 0.5
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)

    y, upd = bn.apply(variables, jnp.asarray(x), train=True,
                      mutable=["batch_stats"])

    halves, stats_halves = [], []
    for h in (x[:4], x[4:]):
        yh, uh = _sync_bn_apply(variables, h)
        halves.append(yh)
        stats_halves.append(uh)
    np.testing.assert_allclose(np.asarray(y),
                               np.concatenate(halves), atol=1e-5)
    # running stats == group 0's (first half's) sync-BN update
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"][k]),
            np.asarray(stats_halves[0]["batch_stats"][k]), atol=1e-6)
        with pytest.raises(AssertionError):
            np.testing.assert_allclose(
                np.asarray(upd["batch_stats"][k]),
                np.asarray(stats_halves[1]["batch_stats"][k]), atol=1e-6)


def _sync_bn_apply(variables, x):
    """Reference single-replica forward: sync-BN over exactly this chunk."""
    bn = blocks.TorchBatchNorm()
    prev = blocks.BN_GROUPS
    blocks.BN_GROUPS = 1
    try:
        return bn.apply(variables, jnp.asarray(x), train=True,
                        mutable=["batch_stats"])
    finally:
        blocks.BN_GROUPS = prev


def test_grouped_bn_model_level_dataparallel_oracle(bn_groups_2):
    """Full Stage1G TRAIN forward with BN_GROUPS=2 == concatenating two
    independent half-batch forwards (each with its own BN stats) — the
    exact output DataParallel over 2 GPUs would gather. Running stats
    match the first half's forward."""
    cfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=4)
    g = Stage1G(cfg)
    rng = np.random.RandomState(1)
    b, o = 4, cfg.num_objects
    z = rng.randn(b, cfg.z_dim).astype(np.float32)
    bbox = np.stack([rng.uniform(0.1, 0.5, (b, o)),
                     rng.uniform(0.1, 0.5, (b, o)),
                     rng.uniform(0.2, 0.4, (b, o)),
                     rng.uniform(0.2, 0.4, (b, o))], -1).astype(np.float32)
    labels = np.zeros((b, o, cfg.label_dim), np.float32)
    labels[:, :, 2] = 1.0

    prev = blocks.BN_GROUPS
    blocks.BN_GROUPS = 1
    try:
        variables = g.init(jax.random.PRNGKey(3), jnp.asarray(z),
                           jnp.asarray(bbox), jnp.asarray(labels), None,
                           train=True, ca_rng=None)
    finally:
        blocks.BN_GROUPS = prev

    out_g, upd_g = g.apply(variables, jnp.asarray(z), jnp.asarray(bbox),
                           jnp.asarray(labels), None, train=True,
                           ca_rng=None, mutable=["batch_stats"])

    halves, stat_updates = [], []
    prev = blocks.BN_GROUPS
    blocks.BN_GROUPS = 1
    try:
        for sl in (slice(0, 2), slice(2, 4)):
            out_h, upd_h = g.apply(
                variables, jnp.asarray(z[sl]), jnp.asarray(bbox[sl]),
                jnp.asarray(labels[sl]), None, train=True, ca_rng=None,
                mutable=["batch_stats"])
            halves.append(np.asarray(out_h["img"]))
            stat_updates.append(upd_h["batch_stats"])
    finally:
        blocks.BN_GROUPS = prev

    np.testing.assert_allclose(np.asarray(out_g["img"]),
                               np.concatenate(halves), atol=2e-5)
    want = jax.tree.leaves(stat_updates[0])
    got = jax.tree.leaves(upd_g["batch_stats"])
    assert len(want) == len(got) and want
    for a, c in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_grouped_bn_uneven_batch_matches_torch_chunk(bn_groups_2):
    """Non-divisible batches hit the uneven path — e.g. the matching-aware
    wrong-pair branch routes b-1 rows through D's cond head BN. torch.chunk
    (DataParallel's scatter) splits 5 rows over 2 GPUs as 3+2; each chunk
    gets its own stats and running stats keep chunk 0's update."""
    bn = blocks.TorchBatchNorm()
    rng = np.random.RandomState(2)
    x = rng.randn(5, 4, 4, 3).astype(np.float32) * 1.5 - 0.2
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)

    y, upd = bn.apply(variables, jnp.asarray(x), train=True,
                      mutable=["batch_stats"])

    chunks, stats = [], []
    for h in (x[:3], x[3:]):  # torch.chunk(5, 2) -> sizes (3, 2)
        yh, uh = _sync_bn_apply(variables, h)
        chunks.append(yh)
        stats.append(uh)
    np.testing.assert_allclose(np.asarray(y),
                               np.concatenate(chunks), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(upd["batch_stats"][k]),
            np.asarray(stats[0]["batch_stats"][k]), atol=1e-6)


def test_grouped_bn_sharded_stats_stay_device_local():
    """BN_GROUPS == mesh device count: the group axis coincides with the
    shard axis, so each device normalizes with ITS OWN shard's stats and
    the normalize needs no cross-device communication (docs/SCALING.md).
    Asserts (a) sharded grouped output == concat of per-shard sync-BN
    forwards, and (b) the compiled stats-free normalize contains no
    collectives at all; the mutable version may only communicate the
    C-sized replica-0 running-stat update, never activations."""
    from multiple_objects_gan_tpu.parallel import mesh as pmesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = pmesh.make_mesh(8)
    bn = blocks.TorchBatchNorm()
    rng = np.random.RandomState(4)
    x = rng.randn(16, 4, 4, 3).astype(np.float32) * 1.3 + 0.7
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    rep = NamedSharding(mesh, P())
    var_s = jax.device_put(variables, rep)
    x_s = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))

    prev = blocks.BN_GROUPS
    blocks.BN_GROUPS = 8
    try:
        fwd = jax.jit(lambda v, x: bn.apply(v, x, train=True,
                                            mutable=["batch_stats"]))
        lowered = fwd.lower(var_s, x_s).compile()
        y, upd = fwd(var_s, x_s)
        y = np.asarray(y)
    finally:
        blocks.BN_GROUPS = prev

    shards = []
    for i in range(8):
        ys, us = _sync_bn_apply(variables, x[2 * i:2 * i + 2])
        shards.append(np.asarray(ys))
        if i == 0:
            first_stats = us["batch_stats"]
    np.testing.assert_allclose(y, np.concatenate(shards), atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(upd["batch_stats"][k]),
                                   np.asarray(first_stats[k]), atol=1e-6)

    # collectives may only move the C-sized replica-0 running-stat
    # update, never activation-shaped (4-D) tensors
    import re
    hlo = lowered.as_text()
    for line in hlo.splitlines():
        if re.search(r"\b(all-reduce|all-gather|collective-permute"
                     r"|all-to-all|reduce-scatter)\b", line):
            assert not re.search(r"\[\d+,\d+,\d+,\d+\]", line), (
                f"grouped-BN moved an activation across devices: {line}")


def test_object_fold_matches_sequential_per_object_loop():
    """blocks.object_fold(O) == the reference's sequential per-object BN
    loop: each object slice normalizes with its OWN batch stats, and the
    running buffers receive O sequential EMA updates in call order
    (code/multi-mnist/model.py:162-169 — the same local1/local2 modules
    are invoked once per object)."""
    bn = blocks.TorchBatchNorm()
    rng = np.random.RandomState(5)
    b, o = 4, 3
    x = rng.randn(b, o, 6, 6, 2).astype(np.float32) * 1.7 + 0.3
    folded = jnp.asarray(x.reshape(b * o, 6, 6, 2))
    variables = bn.init(jax.random.PRNGKey(0), folded, train=True)

    with blocks.object_fold(o):
        y, upd = bn.apply(variables, folded, train=True,
                          mutable=["batch_stats"])
    y = np.asarray(y).reshape(b, o, 6, 6, 2)

    # sequential oracle: one sync-BN call per object, running stats
    # threaded through call-by-call
    running = variables["batch_stats"]
    for idx in range(o):
        yo, uo = bn.apply(
            {"params": variables.get("params", {}), "batch_stats": running},
            jnp.asarray(x[:, idx]), train=True, mutable=["batch_stats"])
        running = uo["batch_stats"]
        np.testing.assert_allclose(y[:, idx], np.asarray(yo), atol=1e-5,
                                   err_msg=f"object {idx}")
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(upd["batch_stats"][k]),
                                   np.asarray(running[k]), atol=1e-6,
                                   err_msg=k)


def test_object_fold_composes_with_bn_groups():
    """fold(O) under BN_GROUPS=2 == each DataParallel replica running its
    own sequential per-object loop on its contiguous batch chunk; running
    stats come from replica 0's loop."""
    bn = blocks.TorchBatchNorm()
    rng = np.random.RandomState(6)
    b, o = 4, 2
    x = rng.randn(b, o, 4, 4, 3).astype(np.float32) - 0.4
    folded = jnp.asarray(x.reshape(b * o, 4, 4, 3))
    variables = bn.init(jax.random.PRNGKey(0), folded, train=True)

    prev = blocks.BN_GROUPS
    blocks.BN_GROUPS = 2
    try:
        with blocks.object_fold(o):
            y, upd = bn.apply(variables, folded, train=True,
                              mutable=["batch_stats"])
    finally:
        blocks.BN_GROUPS = prev
    y = np.asarray(y).reshape(b, o, 4, 4, 3)

    rep_stats = []
    for chunk in (slice(0, 2), slice(2, 4)):
        running = variables["batch_stats"]
        for idx in range(o):
            yo, uo = bn.apply(
                {"params": variables.get("params", {}),
                 "batch_stats": running},
                jnp.asarray(x[chunk, idx]), train=True,
                mutable=["batch_stats"])
            running = uo["batch_stats"]
            np.testing.assert_allclose(
                y[chunk, idx], np.asarray(yo), atol=1e-5,
                err_msg=f"chunk {chunk} object {idx}")
        rep_stats.append(running)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(upd["batch_stats"][k]),
                                   np.asarray(rep_stats[0][k]), atol=1e-6)
