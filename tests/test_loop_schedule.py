"""run_epochs schedule semantics (LR halving must be resume-safe)."""

import numpy as np

from multiple_objects_gan_tpu.data.datasets import Loader
from multiple_objects_gan_tpu.parallel import mesh as pmesh
from multiple_objects_gan_tpu.train.loop import run_epochs


class _Rows:
    def __len__(self):
        return 2

    def __getitem__(self, i):
        return {"x": np.zeros((1,), np.float32)}


class _Writer:
    def scalars(self, step, scalars):
        pass


class _Ckpt:
    def save(self, epoch, state):
        pass


def _run(start_epoch, n_epochs, decay):
    lrs = []

    def step_fn(state, batch, rng, lr_g, lr_d):
        lrs.append(float(lr_g))
        return state, {"loss": np.float32(0.0)}

    run_epochs(loader=Loader(_Rows(), 2, shuffle=False),
               state={}, step_fn=step_fn, mesh=pmesh.make_mesh(1),
               rng=None, lr_g=1.0, lr_d=1.0, n_epochs=n_epochs,
               ckpt=_Ckpt(), writer=_Writer(), start_epoch=start_epoch,
               lr_decay_epochs=decay, snapshot_every=0)
    return lrs


def test_lr_halving_fresh_run_matches_reference_schedule():
    # reference halves when epoch % d == 0 and epoch > 0
    # (code/multi-mnist/trainer.py:105-111): epochs 0..3 with d=2 ->
    # 1, 1, 0.5, 0.5
    assert _run(0, 4, 2) == [1.0, 1.0, 0.5, 0.5]


def test_lr_halving_replayed_on_resume():
    # resuming at epoch 2 must land on the SAME schedule a fresh run is
    # at — halvings before start_epoch included (a stateful `lr *= 0.5`
    # would yield [1.0, 0.5] here instead)
    assert _run(2, 4, 1) == [0.25, 0.125]
    assert _run(0, 4, 1)[2:] == [0.25, 0.125]
