"""tools/convert_checkpoint.py: .pth -> orbax conversion round-trip.

The converted directory must restore to exactly the state the direct
.pth import produces (so serving from the orbax dir is torch-free and
bit-identical to importing the reference checkpoint)."""

import dataclasses
import os
import sys

import numpy as np
import jax
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
from multiple_objects_gan_tpu.io.torch_import import (
    maybe_load_reference_d, maybe_load_reference_g)
from multiple_objects_gan_tpu.models import common
from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
from multiple_objects_gan_tpu.train.step import create_state

from test_torch_parity import (  # noqa: E402
    MCFG, NDF, Stage1DTorch, Stage1GTorch, _randomize)


def test_convert_stage1_roundtrip(tmp_path):
    from tools.convert_checkpoint import main as convert_main

    tg = _randomize(Stage1GTorch(), seed=3)
    td = _randomize(Stage1DTorch(), seed=5)
    g_path, d_path = str(tmp_path / "netG.pth"), str(tmp_path / "netD.pth")
    torch.save({"netG": tg.state_dict()}, g_path)
    torch.save({k.replace("head.", "get_cond_logits.outlogits."): v
                for k, v in td.state_dict().items()}, d_path)

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    out = str(tmp_path / "converted")
    convert_main(["stage1", "--variant", "multi-mnist",
                  "--cfg", os.path.join(repo, "cfg", "mnist_eval.yml"),
                  "--net_g", g_path, "--net_d", d_path, "--out", out,
                  "--gf_dim", str(MCFG.gf_dim), "--df_dim", str(NDF)])

    # restore the converted dir and compare against the direct import
    dcfg = dataclasses.replace(MCFG, df_dim=NDF)
    template = create_state(dcfg, Stage1G(dcfg), Stage1D(dcfg),
                            jax.random.PRNGKey(0), batch_size=2)
    restored, epoch = CheckpointManager(
        os.path.join(out, "models")).restore(template)
    assert epoch == 0

    direct = maybe_load_reference_g(g_path, dcfg, template)
    direct = maybe_load_reference_d(d_path, dcfg, direct)
    for a, b in zip(jax.tree.leaves(restored.g_params),
                    jax.tree.leaves(direct.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.d_params),
                    jax.tree.leaves(direct.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.g_stats),
                    jax.tree.leaves(direct.g_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
