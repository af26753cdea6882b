"""Checkpoint save/restore with rotation (orbax-backed).

Parity target: save_model + keep-newest-5 rotation
(code/multi-mnist/miscc/utils.py:160-174) and the attngan full-state resume
(code/coco/attngan/trainer.py:99-107,150-158): G, D(s), both optimizers,
epoch counter, and — for attngan — the EMA copy of G.

The whole GANTrainState pytree is checkpointed, so resume restores
optimizer moments and BatchNorm running stats exactly (a superset of the
reference's stage-1 behavior, matching its attngan behavior).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from multiple_objects_gan_tpu.train.state import GANTrainState


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with keep-5 rotation."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, epoch: int, state: GANTrainState, wait: bool = False):
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: GANTrainState,
                epoch: Optional[int] = None) -> tuple[GANTrainState, int]:
        """Restore into the structure of ``state_template``."""
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint under {self._dir}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                state_template)
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(abstract))
        return restored, epoch

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
