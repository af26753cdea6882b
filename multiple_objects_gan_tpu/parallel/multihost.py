"""Multi-host (multi-process) SPMD support.

The reference is strictly single-process (SURVEY.md §2.8 — DataParallel
inside one Python process). On a multi-host TPU slice — or a
multi-process CPU rig, which is how tests/test_multihost.py validates
this without hardware — each process must join the JAX distributed
runtime BEFORE first backend use. After that the existing data-parallel
layer works unchanged:

  * ``parallel/mesh.py:shard_batch`` assembles global arrays from
    process-local shards (``jax.make_array_from_process_local_data``) —
    sample data never crosses hosts;
  * gradient / sync-BN all-reduces ride ICI within the slice;
  * orbax checkpointing is process-coordinated out of the box;
  * ``data/datasets.py:Loader(shard=(process_index, process_count))``
    partitions each epoch's shuffled order disjointly across hosts
    (every process sees the same global order, takes its own slice).

See docs/SCALING.md for the full multi-host recipe.
"""

from __future__ import annotations

import os

import jax


def maybe_initialize_distributed() -> bool:
    """Join the JAX distributed runtime if configured via env; else no-op.

    Two modes (both must run before any JAX backend use):

    * explicit — ``MOG_COORDINATOR=host:port MOG_NUM_PROCESSES=n
      MOG_PROCESS_ID=i`` (manual launches, CPU test rigs);
    * auto — ``MOG_MULTIHOST=1`` defers to
      ``jax.distributed.initialize()``'s cluster auto-detection
      (TPU pods / managed environments).

    Returns True when the distributed runtime was initialized.
    """
    if os.environ.get("MOG_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["MOG_COORDINATOR"],
            num_processes=int(os.environ["MOG_NUM_PROCESSES"]),
            process_id=int(os.environ["MOG_PROCESS_ID"]))
        return True
    if os.environ.get("MOG_MULTIHOST"):
        jax.distributed.initialize()
        return True
    return False


def local_batch_size(global_batch: int) -> int:
    """The per-process share of a global batch (cfg batch sizes are GLOBAL,
    like the reference's — one process was the whole world there)."""
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} must divide evenly over "
            f"{pc} processes")
    return global_batch // pc


def is_main_process() -> bool:
    """True on the process that should own logging / image dumps."""
    return jax.process_index() == 0


def shard_loader_kwargs(global_batch: int) -> dict:
    """Loader kwargs for multi-host data sharding: each process batches
    its per-process share of the global batch from a disjoint slice of
    the (identically-seeded) shuffled order. Single-process: identity."""
    return {"batch_size": local_batch_size(global_batch),
            "shard": (jax.process_index(), jax.process_count())}
