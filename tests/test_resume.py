"""Train-loop resume: full-state restore continues from the saved epoch."""

import dataclasses
import os

import jax
import numpy as np

from multiple_objects_gan_tpu.config.config import default_config
from multiple_objects_gan_tpu.data.datasets import (
    Loader,
    MultiMnistDataset,
    write_synthetic_multimnist,
)
from multiple_objects_gan_tpu.models import common
from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
from multiple_objects_gan_tpu.train.loop import train


def test_loop_resume_roundtrip(tmp_path, capsys):
    data_dir = str(tmp_path / "data")
    write_synthetic_multimnist(data_dir, n=16, split="train")
    ds = MultiMnistDataset(data_dir, split="train")
    loader = Loader(ds, 8, shuffle=True, seed=0)  # 8 devices

    cfg = default_config("multi-mnist")
    cfg.TRAIN.SNAPSHOT_INTERVAL = 1
    mcfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=4)
    g, d = Stage1G(mcfg), Stage1D(mcfg)

    out1 = str(tmp_path / "run1")
    state1 = train(cfg, mcfg, g, d, loader, out1, seed=0, max_epochs=2)
    assert int(np.asarray(state1.step)) == 4  # 2 epochs x 2 batches

    out2 = str(tmp_path / "run2")
    state2 = train(cfg, mcfg, g, d, loader, out2, seed=0, max_epochs=3,
                   resume_dir=out1)
    captured = capsys.readouterr().out
    assert "resumed from" in captured
    # resumed at epoch 2, ran one more epoch: 4 + 2 = 6 steps
    assert int(np.asarray(state2.step)) == 6
    assert os.path.isdir(os.path.join(out2, "models"))


def test_final_epoch_always_snapshotted(tmp_path):
    """A large SNAPSHOT_INTERVAL skips mid-run snapshots but the last
    epoch is still checkpointed (the contract behind the CLI's
    --snapshot_interval override)."""
    data_dir = str(tmp_path / "data")
    write_synthetic_multimnist(data_dir, n=16, split="train")
    ds = MultiMnistDataset(data_dir, split="train")
    loader = Loader(ds, 8, shuffle=True, seed=0)

    cfg = default_config("multi-mnist")
    cfg.TRAIN.SNAPSHOT_INTERVAL = 50  # >> max_epochs
    mcfg = dataclasses.replace(common.MNIST, gf_dim=8, df_dim=4)
    out = str(tmp_path / "run")
    train(cfg, mcfg, Stage1G(mcfg), Stage1D(mcfg), loader, out,
          seed=0, max_epochs=2)
    model_dir = os.path.join(out, "models")
    epochs = sorted(d for d in os.listdir(model_dir)
                    if d.split(".")[0].isdigit())
    assert epochs == ["1"], epochs  # only the final epoch


def test_resume_flag_mismatch_warns(tmp_path):
    """run_flags.json records --bn_groups/--bf16; resuming with different
    trace-time knobs must warn (they silently change training dynamics —
    ADVICE r3)."""
    import json
    import warnings

    import pytest

    from multiple_objects_gan_tpu.cli.main import check_resume_flags

    prev = tmp_path / "prev_run"
    prev.mkdir()
    with open(prev / "run_flags.json", "w") as f:
        json.dump({"bn_groups": 2, "bf16": True, "variant": "multi-mnist",
                   "manualSeed": 7}, f)

    with pytest.warns(UserWarning, match="bn_groups differs"):
        got = check_resume_flags(str(prev), bn_groups=None, bf16=True)
    assert got == ["bn_groups"]
    with pytest.warns(UserWarning, match="bf16 differs"):
        check_resume_flags(str(prev), bn_groups=2, bf16=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert check_resume_flags(str(prev), bn_groups=2, bf16=True) == []
        # no run_flags.json (pre-round-4 output dir): silent no-op
        assert check_resume_flags(str(tmp_path), bn_groups=None,
                                  bf16=False) == []


def test_record_run_flags_in_place_resume(tmp_path):
    """An in-place resume (--resume == --output_dir) must (a) still fire
    the mismatch warning — i.e. the check reads the original record before
    any rewrite — and (b) preserve the original run_flags.json so future
    resumes compare against the run's true origin."""
    import json
    import warnings

    import pytest

    from multiple_objects_gan_tpu.cli.main import record_run_flags

    out = tmp_path / "run"
    out.mkdir()
    # original run writes its record
    path = record_run_flags(str(out), None, bn_groups=2, bf16=True,
                            variant="multi-mnist", manualSeed=7)
    # in-place resume that FORGETS --bn_groups/--bf16: must warn...
    with pytest.warns(UserWarning, match="differs"):
        record_run_flags(str(out), str(out), bn_groups=None, bf16=False,
                         variant="multi-mnist", manualSeed=7)
    # ...and keep the original record intact
    with open(path) as f:
        assert json.load(f)["bn_groups"] == 2
    # resume into a DIFFERENT output dir: new record written there, checked
    # against the old dir
    out2 = tmp_path / "run2"
    out2.mkdir()
    with pytest.warns(UserWarning, match="bf16 differs"):
        p2 = record_run_flags(str(out2), str(out), bn_groups=2, bf16=False,
                              variant="multi-mnist", manualSeed=7)
    with open(p2) as f:
        assert json.load(f)["bf16"] is False
    # matching in-place resume: no warning, record untouched
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        record_run_flags(str(out), str(out), bn_groups=2, bf16=True,
                         variant="multi-mnist", manualSeed=7)


def test_record_run_flags_git_sha(tmp_path):
    """run_flags.json carries the HEAD sha of the code that ran (ADVICE
    r4): committed run artifacts reference the exact commit instead of a
    full src_snapshot copy. In this checkout the sha must be present and
    40-hex (optionally '-dirty'); outside a git tree _git_sha returns ''
    and the key is simply absent."""
    import json
    import re

    from multiple_objects_gan_tpu.cli.main import _git_sha, record_run_flags

    out = tmp_path / "run"
    out.mkdir()
    path = record_run_flags(str(out), None, bn_groups=None, bf16=True,
                            variant="multi-mnist", manualSeed=7)
    with open(path) as f:
        flags = json.load(f)
    sha = _git_sha()
    if sha:  # running from the git checkout (the normal case)
        assert flags["git_sha"] == sha
        assert re.fullmatch(r"[0-9a-f]{40}(-dirty)?", sha)
    else:
        assert "git_sha" not in flags
