"""Device mesh + sharding helpers — the SPMD data-parallel layer.

Replaces the reference's single-process ``nn.parallel.data_parallel``
(code/multi-mnist/trainer.py:42-46 and every loss call site) with JAX SPMD:
the batch is sharded over a 1-D ``data`` mesh axis, params/optimizer state
are replicated, and XLA inserts the gradient all-reduce (psum) over ICI
automatically when the jitted train step consumes sharded batches.

BatchNorm note: batch statistics under this scheme are computed over the
GLOBAL batch (sync-BN), unlike DataParallel's per-replica stats — the
TPU-idiomatic choice (documented in nn/blocks.py).

No hierarchy is needed at reference scale (the models are tiny: <50M
params); TP/PP are intentionally absent, mirroring SURVEY.md §2.8. If a
multi-host slice is used, per-host data sharding composes with the same
mesh via jax.make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[list] = None) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def make_mesh_for_batch(batch_size: int) -> Mesh:
    """Data mesh clamped to the largest device count dividing the batch.

    A sharded batch axis must divide evenly over the mesh; reference
    configs use non-power-of-two batches (coco_attn_train.yml: 14), so
    rather than crash, shard over the largest compatible device prefix
    (worst case 1 device = unsharded).

    ``batch_size`` is the LOCAL (per-process) batch. Multi-process runs
    cannot clamp to a device prefix (every process must contribute to a
    global array), so there the mesh spans all devices and the global
    batch must divide evenly.
    """
    n_dev = len(jax.devices())
    if jax.process_count() > 1:
        global_b = batch_size * jax.process_count()
        if global_b % n_dev:
            raise ValueError(
                f"global batch {global_b} must divide over {n_dev} devices "
                "on a multi-process mesh (no prefix-clamping across hosts)")
        return make_mesh()
    n = max(d for d in range(1, n_dev + 1) if batch_size % d == 0)
    if n < n_dev:
        lo = (batch_size // n_dev) * n_dev
        hi = lo + n_dev
        suggestion = (f"TRAIN.BATCH_SIZE={hi}"
                      + (f" or {lo}" if lo else ""))
        import warnings
        warnings.warn(
            f"batch size {batch_size} does not divide over the {n_dev} "
            f"available devices: sharding over {n} device(s), leaving "
            f"{n_dev - n} idle. For full utilization set {suggestion} "
            f"(any multiple of {n_dev}).",
            UserWarning, stacklevel=2)
    return make_mesh(n)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with the batch axis sharded over the mesh.

    Multi-host (multi-process) slices: each process passes its LOCAL shard
    of the global batch (global_batch = local_batch * process_count) and
    the global array is assembled via
    ``jax.make_array_from_process_local_data`` — data never leaves the
    host that loaded it; the mesh must span all processes' devices
    (``make_mesh()`` over ``jax.devices()`` does). Single-process is a
    plain sharded device_put.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(mesh: Mesh, state: Any) -> Any:
    """Replicate a train-state pytree across the mesh."""
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def jit_train_step(train_step):
    """Jit a train step for SPMD execution.

    Shardings are carried by the input arrays themselves (state replicated
    via :func:`replicate_state`, batch sharded via :func:`shard_batch`);
    XLA propagates them and inserts the gradient all-reduce over ICI. The
    old state buffers are donated to the new state.
    """
    return jax.jit(train_step, donate_argnums=(0,))
