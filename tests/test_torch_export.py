"""Round-trip tests for io/torch_export (this framework -> reference .pth).

Strategy: take reference-format state_dicts from the randomized torch
replicas (the same oracles the import parity tests use), run them through
import -> export, and require the exported dict to reproduce the original
exactly (same keys, same values). The importers are value-parity-tested
against torch forwards, so an exact sd-space round trip proves exported
checkpoints load into the PyTorch reference with identical behavior.
A final test load_state_dicts an export into the torch replica and checks
forward parity the reverse way (flax weights -> torch forward).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multiple_objects_gan_tpu.io import torch_export as tx  # noqa: E402
from multiple_objects_gan_tpu.io import torch_import as ti  # noqa: E402

import test_attngan_parity as ap  # noqa: E402
import test_torch_parity as tp  # noqa: E402

# keys export synthesizes for the mnist dead label module
# (code/multi-mnist/model.py:137-140) that the replicas omit
DEAD_LABEL_KEYS = {
    "label.0.weight", "label.1.weight", "label.1.bias",
    "label.1.running_mean", "label.1.running_var",
    "label.1.num_batches_tracked"}


def _np_sd(module_or_sd, renames=()):
    sd = (module_or_sd.state_dict() if hasattr(module_or_sd, "state_dict")
          else module_or_sd)
    out = {}
    for k, v in sd.items():
        for old, new in renames:
            k = k.replace(old, new)
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def _assert_sd_roundtrip(orig: dict, exported: dict, allowed_extra=()):
    missing = set(orig) - set(exported)
    assert not missing, f"export lost keys: {sorted(missing)}"
    extra = set(exported) - set(orig)
    assert extra <= set(allowed_extra), f"unexpected keys: {sorted(extra)}"
    for k in orig:
        np.testing.assert_array_equal(
            np.asarray(exported[k], np.float64),
            np.asarray(orig[k], np.float64), err_msg=k)


def test_stage1_g_export_roundtrip_mnist():
    sd = _np_sd(tp._randomize(tp.Stage1GTorch(), seed=3))
    params, stats = ti.import_stage1_g({"netG": sd}, tp.MCFG)
    exported = tx.export_stage1_g(params, stats, tp.MCFG)
    _assert_sd_roundtrip(sd, exported, allowed_extra=DEAD_LABEL_KEYS)


def test_stage1_g_export_roundtrip_clevr():
    sd = _np_sd(tp._randomize(tp.ClevrG_Torch(), seed=23))
    params, stats = ti.import_stage1_g({"netG": sd}, tp.CLCFG)
    exported = tx.export_stage1_g(params, stats, tp.CLCFG)
    _assert_sd_roundtrip(sd, exported)


def test_stage1_g_export_roundtrip_stackgan():
    sd = _np_sd(tp._randomize(tp.StackganG_Torch(), seed=21),
                renames=[("ca_fc", "ca_net.fc")])
    params, stats = ti.import_stage1_g({"netG": sd}, tp.S1CFG)
    exported = tx.export_stage1_g(params, stats, tp.S1CFG)
    _assert_sd_roundtrip(sd, exported)


def test_stage1_d_export_roundtrip():
    sd = _np_sd(tp._randomize(tp.Stage1DTorch(), seed=11),
                renames=[("head.", "get_cond_logits.outlogits.")])
    params, stats = ti.import_stage1_d(sd, tp.MCFG)
    exported = tx.export_stage1_d(params, stats)
    _assert_sd_roundtrip(sd, exported)


def test_stage2_g_export_roundtrip():
    sd = _np_sd(tp._randomize(tp.Stage2G_Torch(), seed=51),
                renames=[("ca_fc", "ca_net.fc")])
    _, (params, stats) = ti.import_stage2_g({"netG": sd}, None, tp.S2CFG,
                                            r_num=2)
    exported = tx.export_stage2_g(None, None, params, stats, None, r_num=2)
    _assert_sd_roundtrip(sd, exported)


def test_stage2_d_export_roundtrip():
    sd = _np_sd(tp._randomize(tp.Stage2D_Torch(), seed=81),
                renames=[("uncond_head.", "get_uncond_logits.outlogits.0."),
                         ("cond_head.", "get_cond_logits.outlogits.")])
    params, stats = ti.import_stage2_d(sd)
    exported = tx.export_stage2_d(params, stats)
    _assert_sd_roundtrip(sd, exported)


def test_attngan_g_export_roundtrip():
    sd = _np_sd(ap._randomize(ap.AttnGNetTorch(), seed=9))
    params, stats = ti.import_attngan_g({"netG": sd},
                                        branch_num=ap.CFG.branch_num,
                                        r_num=ap.CFG.r_num)
    exported = tx.export_attngan_g(params, stats,
                                   branch_num=ap.CFG.branch_num,
                                   r_num=ap.CFG.r_num)
    _assert_sd_roundtrip(sd, exported)


def test_reference_checkpoint_container(tmp_path):
    """save_reference_checkpoint writes the reference's save_model dict
    format (miscc/utils.py:160-174), loadable via load_torch_checkpoint."""
    sd_g = _np_sd(tp._randomize(tp.Stage1GTorch(), seed=3))
    params, stats = ti.import_stage1_g({"netG": sd_g}, tp.MCFG)
    path = str(tmp_path / "checkpoint_0007.pth")
    tx.save_reference_checkpoint(path, 7,
                                 net_g=tx.export_stage1_g(params, stats,
                                                          tp.MCFG))
    ckpt = ti.load_torch_checkpoint(path)
    assert ckpt["epoch"] == 7
    assert ckpt["optimG"] == {} and ckpt["netD"] == {}
    params2, stats2 = ti.import_stage1_g(ckpt, tp.MCFG)
    jax.tree.map(np.testing.assert_array_equal, params, params2)
    jax.tree.map(np.testing.assert_array_equal, stats, stats2)


def test_export_loads_into_torch_replica_forward_parity():
    """Reverse-direction end-to-end: random-init OUR Stage1G, export to a
    reference state_dict, load it into the torch replica, require the
    torch forward to reproduce the flax forward."""
    from multiple_objects_gan_tpu.models.stage1 import Stage1G
    from multiple_objects_gan_tpu.ops import transformation_matrix_inverse

    rng = np.random.RandomState(2)
    b = 2
    z = rng.randn(b, tp.MCFG.z_dim).astype(np.float32)
    bbox = np.stack([rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.05, 0.5, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3)),
                     rng.uniform(0.2, 0.4, (b, 3))], -1).astype(np.float32)
    onehot = np.zeros((b, 3, 10), np.float32)
    for i in range(b):
        for j in range(3):
            onehot[i, j, rng.randint(10)] = 1.0

    g = Stage1G(tp.MCFG)
    variables = g.init(jax.random.PRNGKey(4), jnp.asarray(z),
                       jnp.asarray(bbox), jnp.asarray(onehot), None,
                       train=False, ca_rng=None)
    out = g.apply(variables, jnp.asarray(z), jnp.asarray(bbox),
                  jnp.asarray(onehot), None, train=False, ca_rng=None)
    want = np.asarray(out["img"]).transpose(0, 3, 1, 2)

    sd = tx.export_stage1_g(variables["params"], variables["batch_stats"],
                            tp.MCFG)
    tg = tp.Stage1GTorch()
    result = tg.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not result.missing_keys, result.missing_keys
    # the replica omits the reference's dead label module; everything else
    # must land
    assert set(result.unexpected_keys) <= DEAD_LABEL_KEYS, \
        result.unexpected_keys
    tg.eval()
    theta = np.asarray(transformation_matrix_inverse(jnp.asarray(bbox)))
    with torch.no_grad():
        got = tg(torch.from_numpy(z), torch.from_numpy(theta),
                 torch.from_numpy(onehot)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_export_checkpoint_tool_stage1(tmp_path):
    """End-to-end: orbax checkpoint -> tools/export_checkpoint.py ->
    reference .pth -> reimport matches the original state."""
    import os
    import subprocess
    import sys

    from multiple_objects_gan_tpu.config.config import (
        cfg_from_file, stage1_model_config)
    from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import create_state

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = os.path.join(repo, "cfg", "mnist_eval.yml")
    cfg = cfg_from_file(cfg_path, "multi-mnist")
    mcfg = stage1_model_config(cfg, "multi-mnist")
    state = create_state(mcfg, Stage1G(mcfg), Stage1D(mcfg),
                         jax.random.PRNGKey(7), batch_size=2)
    out_dir = tmp_path / "run"
    mgr = CheckpointManager(str(out_dir / "models"))
    mgr.save(3, state, wait=True)
    mgr.close()

    g_pth = str(tmp_path / "netG.pth")
    d_pth = str(tmp_path / "netD.pth")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "export_checkpoint.py"),
         "stage1", "--variant", "multi-mnist", "--cfg", cfg_path,
         "--ckpt", str(out_dir), "--out", g_pth, "--out_d", d_pth],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr
    assert "epoch 3" in proc.stdout

    ckpt = ti.load_torch_checkpoint(g_pth)
    assert ckpt["epoch"] == 3
    params, stats = ti.import_stage1_g(ckpt, mcfg)
    jax.tree.map(np.testing.assert_array_equal, params,
                 jax.tree.map(np.asarray, state.g_params))
    jax.tree.map(np.testing.assert_array_equal, stats,
                 jax.tree.map(np.asarray, state.g_stats))
    d_params, d_stats = ti.import_stage1_d(
        ti.load_torch_checkpoint(d_pth), mcfg)
    jax.tree.map(np.testing.assert_array_equal, d_params,
                 jax.tree.map(np.asarray, state.d_params))


def _attngan_head_sd(rng, ndf, nef):
    """Reference-format COND_DNET/UNCOND_DNET keys (random values)."""
    sd = {
        "COND_DNET.jointConv.0.weight":
            rng.randn(ndf * 8, ndf * 8 + nef, 3, 3).astype(np.float32),
        "COND_DNET.jointConv.1.weight": rng.randn(ndf * 8).astype(np.float32),
        "COND_DNET.jointConv.1.bias": rng.randn(ndf * 8).astype(np.float32),
        "COND_DNET.jointConv.1.running_mean":
            rng.randn(ndf * 8).astype(np.float32),
        "COND_DNET.jointConv.1.running_var":
            (1.0 + rng.rand(ndf * 8)).astype(np.float32),
        "COND_DNET.jointConv.1.num_batches_tracked": np.zeros((), np.int64),
        "COND_DNET.outlogits.0.weight":
            rng.randn(1, ndf * 8, 4, 4).astype(np.float32),
        "COND_DNET.outlogits.0.bias": rng.randn(1).astype(np.float32),
        "UNCOND_DNET.outlogits.0.weight":
            rng.randn(1, ndf * 8, 4, 4).astype(np.float32),
        "UNCOND_DNET.outlogits.0.bias": rng.randn(1).astype(np.float32),
    }
    return sd


@pytest.mark.parametrize("scale", [64, 128, 256])
def test_attngan_d_export_roundtrip(scale):
    rng = np.random.RandomState(scale)
    if scale == 64:
        feat = _np_sd(ap._randomize(ap.AttnD64Torch(), seed=61),
                      renames=[("joint.", "COND_DNET.jointConv."),
                               ("out_cond.", "COND_DNET.outlogits.0."),
                               ("out_uncond.", "UNCOND_DNET.outlogits.0.")])
        sd = feat  # replica already includes the heads
    else:
        rep = (ap.AttnD128Torch() if scale == 128 else ap.AttnD256Torch())
        feat = _np_sd(ap._randomize(rep, seed=scale))
        sd = {**feat, **_attngan_head_sd(rng, ap.NDF, ap.NEF)}
    params, stats = ti.import_attngan_d(sd, scale=scale)
    exported = tx.export_attngan_d(params, stats, scale=scale)
    _assert_sd_roundtrip(sd, exported)


def test_attngan_warm_start_from_exported_pth(tmp_path):
    """Train-time TRAIN.NET_G warm-start (reference trainer.py:110-126):
    export a tiny attngan state to bare netG_epoch_4.pth + netD%d.pth,
    warm-start a fresh state from them, and require weight equality plus
    the epoch parsed from the filename."""
    import torch as _torch

    from multiple_objects_gan_tpu.cli.attngan_runner import (
        maybe_warm_start_attngan)
    from multiple_objects_gan_tpu.models.attngan import (
        DNet64, DNetScale, GNet)
    from multiple_objects_gan_tpu.train.attngan_step import (
        create_attngan_state)

    cfg = ap.CFG  # branch_num=2, tiny dims
    g = GNet(cfg)
    d_modules = {"d64": DNet64(cfg), "d128": DNetScale(cfg, scale=128)}
    src = create_attngan_state(cfg, g, d_modules, jax.random.PRNGKey(3),
                               batch_size=2, seq_len=5)

    def t(sd):
        return {k: _torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}

    g_path = str(tmp_path / "netG_epoch_4.pth")
    _torch.save(t(tx.export_attngan_g(src.g_params, src.g_stats,
                                      branch_num=cfg.branch_num,
                                      r_num=cfg.r_num)), g_path)
    for i, name in enumerate(("d64", "d128")):
        _torch.save(t(tx.export_attngan_d(src.d_params[name],
                                          src.d_stats[name],
                                          scale=int(name[1:]))),
                    str(tmp_path / f"netD{i}.pth"))

    dst = create_attngan_state(cfg, g, d_modules, jax.random.PRNGKey(99),
                               batch_size=2, seq_len=5)
    dst, epoch = maybe_warm_start_attngan(dst, g_path, cfg)
    assert epoch == 5
    jax.tree.map(np.testing.assert_array_equal,
                 jax.tree.map(np.asarray, dst.g_params),
                 jax.tree.map(np.asarray, src.g_params))
    jax.tree.map(np.testing.assert_array_equal,
                 jax.tree.map(np.asarray, dst.g_ema),
                 jax.tree.map(np.asarray, src.g_params))
    for name in ("d64", "d128"):
        jax.tree.map(np.testing.assert_array_equal,
                     jax.tree.map(np.asarray, dst.d_params[name]),
                     jax.tree.map(np.asarray, src.d_params[name]))

    # missing file -> untouched state, epoch 0
    same, epoch0 = maybe_warm_start_attngan(dst, str(tmp_path / "no.pth"),
                                            cfg)
    assert epoch0 == 0 and same is dst
