"""CLI entry point: train / sample for every variant.

Parity target: <variant>/main.py in the reference
(code/multi-mnist/main.py:27-95): --cfg YAML, --data_dir override,
--manualSeed; TRAIN.FLAG in the YAML picks train vs sample, and the output
dir is ../output/{DATASET}_{timestamp} with a source snapshot. attngan adds
--resume (code/coco/attngan/main.py:25-36).

Usage:
  python -m multiple_objects_gan_tpu.cli.main --variant multi-mnist \
      --cfg cfg/mnist_train.yml [--data_dir D] [--output_dir O] \
      [--manualSeed N] [--max_epochs N] [--synthetic]
"""

from __future__ import annotations

import argparse
import datetime
import os
import random
import shutil
import sys

import numpy as np
from multiple_objects_gan_tpu.parallel.multihost import shard_loader_kwargs


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="multiple-objects-gan (TPU)")
    p.add_argument("--variant", required=True,
                   choices=["multi-mnist", "clevr", "coco-stackgan-1",
                            "coco-stackgan-2", "coco-attngan", "damsm"])
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument("--data_dir", default="")
    p.add_argument("--img_dir", default="",
                   help="override cfg.IMG_DIR (COCO JPEG directory)")
    p.add_argument("--gpu", dest="gpu_id", default="",
                   help="reference-CLI compatibility (GPU ids); a no-op "
                        "on TPU — the SPMD mesh spans all attached chips")
    p.add_argument("--output_dir", default="")
    p.add_argument("--manualSeed", type=int, default=None)
    p.add_argument("--resume", default="",
                   help="output dir of a previous run to resume from")
    p.add_argument("--max_epochs", type=int, default=None,
                   help="override TRAIN.MAX_EPOCH (smoke runs)")
    p.add_argument("--snapshot_interval", type=int, default=None,
                   help="override TRAIN.SNAPSHOT_INTERVAL (the final "
                        "epoch is always checkpointed; a large value "
                        "skips mid-run snapshots — a full stage-2 state "
                        "is ~2.5 GB, a slow fetch on tunneled dev TPUs)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic dataset when data is absent")
    p.add_argument("--profile", default="",
                   help="directory for a jax.profiler trace of steps 2-5")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 activations (f32 master weights/BN/STN) — "
                        "+25%% measured training throughput on TPU v5e")
    p.add_argument("--bn_groups", type=int, default=None,
                   help="train-mode BN statistic groups: 1 = global-batch "
                        "sync-BN (default), G > 1 = per-replica "
                        "DataParallel semantics over G contiguous batch "
                        "chunks (set to the reference run's GPU count to "
                        "reproduce its BN dynamics; nn/blocks.py "
                        "BN_GROUPS)")
    p.add_argument("--stochastic_ca", action="store_true",
                   help="reparametrize CA with fresh noise at eval "
                        "(reference eval behavior, stackgan "
                        "model.py:66-71) instead of c = mu")
    p.add_argument("--num_objects", type=int, default=None,
                   help="layout surgery at sampling: truncate / extend "
                        "the per-image object count (ref "
                        "trainer.py:219-243 num_digits_per_img)")
    p.add_argument("--bbox_scale", type=float, default=None,
                   help="layout surgery at sampling: scale every bbox's "
                        "w/h (ref trainer.py:245-253 change_bbox_size)")
    p.add_argument("--num_images", type=int, default=0,
                   help="cap the bulk sampling() dump (0 = full test "
                        "split; the reference dumps 30k, "
                        "code/coco/attngan/trainer.py:387-472)")
    p.add_argument("--eval_mode", default="auto",
                   choices=["auto", "sample", "sampling", "gen_example"],
                   help="attngan eval path: auto follows the reference "
                        "dispatch (B_VALIDATION -> sample, else "
                        "gen_example); 'sampling' is the bulk FID/IS dump")
    return p.parse_args(argv)


def check_resume_flags(resume_dir: str, **current) -> list:
    """Compare the trace-time knobs against the resumed run's
    run_flags.json; warn per mismatch (a resumed run that forgets
    --bn_groups/--bf16 silently changes training dynamics — ADVICE r3).
    Returns the mismatched keys (for tests)."""
    import json
    import warnings

    path = os.path.join(resume_dir, "run_flags.json")
    if not os.path.isfile(path):
        return []
    with open(path) as f:
        prev = json.load(f)
    mismatched = []
    for key, cur in current.items():
        if key in prev and prev[key] != cur:
            mismatched.append(key)
            warnings.warn(
                f"--resume: {key} differs from the original run "
                f"({prev[key]!r} -> {cur!r}) — training dynamics will "
                "change mid-run; re-pass the original flag unless this "
                "is intentional", UserWarning)
    return mismatched


def record_run_flags(output_dir: str, resume: str | None, **flags) -> str:
    """Check-then-record the trace-time knobs (--bn_groups/--bf16/...).

    Order matters: on an in-place resume (--resume == --output_dir) the
    mismatch check must read the ORIGINAL run's run_flags.json before
    anything overwrites it, and the original record is preserved so later
    resumes still compare against the run's true origin.
    Returns the run_flags.json path (for tests)."""
    import json

    if resume:
        check_resume_flags(resume, **{k: flags[k]
                                      for k in ("bn_groups", "bf16")
                                      if k in flags})
    path = os.path.join(output_dir, "run_flags.json")
    in_place_resume = bool(
        resume and os.path.isfile(path) and os.path.isdir(resume)
        and os.path.samefile(resume, output_dir))
    if not in_place_resume:
        # provenance: the exact code state of the run (ADVICE r4 — the
        # src_snapshot copy can't say WHICH commit it matches; the SHA
        # can, and committed run artifacts then don't need the copy)
        sha = _git_sha()
        if sha:
            flags = dict(flags, git_sha=sha)
        with open(path, "w") as f:
            json.dump(flags, f)
    return path


def _git_sha() -> str:
    """HEAD sha of the repo containing this package ('' if not a git
    checkout / git unavailable); '-dirty' appended when the tree has
    uncommitted changes, so run_flags provenance can't silently claim a
    clean commit it didn't run."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        sha = subprocess.run(
            ["git", "-C", repo, "rev-parse", "HEAD"], capture_output=True,
            text=True, timeout=10, check=True).stdout.strip()
        dirty = subprocess.run(
            ["git", "-C", repo, "status", "--porcelain",
             "--untracked-files=no", "--", ".",
             ":(exclude)PROGRESS.jsonl"],  # driver-owned, always touched
            capture_output=True, text=True,
            timeout=10, check=True).stdout.strip()
        return sha + ("-dirty" if dirty else "")
    except Exception:
        return ""


def main(argv=None):
    args = parse_args(argv)
    # multi-host slices: join the JAX distributed runtime BEFORE any
    # backend use (env-gated: MOG_MULTIHOST=1 or MOG_COORDINATOR/...).
    # After this, the mesh spans all hosts' devices, each process loads
    # its data shard, and only process 0 logs (docs/SCALING.md).
    from multiple_objects_gan_tpu.parallel.multihost import (
        maybe_initialize_distributed)
    maybe_initialize_distributed()
    # persistent XLA compilation cache: repeated CLI runs (and crashed-run
    # retries) skip recompiles — important on tunneled TPUs where a big
    # compile takes minutes. TPU-only: CPU cache entries embed host machine
    # features, and the cache dir can outlive the host — a stale CPU entry
    # loaded on a different machine SIGABRTs mid-execution (observed: the
    # attngan CPU train step after a host change).
    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from multiple_objects_gan_tpu.config.config import cfg_from_file

    if args.bf16:
        import jax.numpy as jnp

        from multiple_objects_gan_tpu.nn import blocks
        blocks.set_compute_dtype(jnp.bfloat16)
    if args.bn_groups is not None:
        from multiple_objects_gan_tpu.nn import blocks
        blocks.set_bn_groups(args.bn_groups)

    cfg_variant = {"multi-mnist": "multi-mnist", "clevr": "clevr",
                   "coco-stackgan-1": "coco-stackgan",
                   "coco-stackgan-2": "coco-stackgan",
                   "coco-attngan": "coco-attngan",
                   "damsm": "coco-attngan"}[args.variant]
    cfg = cfg_from_file(args.cfg_file, cfg_variant)
    if args.data_dir:
        cfg.DATA_DIR = args.data_dir
    if args.img_dir and hasattr(cfg, "IMG_DIR"):
        cfg.IMG_DIR = args.img_dir
    if args.gpu_id:
        cfg.GPU_ID = args.gpu_id  # recorded in the cfg snapshot; no-op on TPU
    if args.snapshot_interval is not None:
        cfg.TRAIN.SNAPSHOT_INTERVAL = args.snapshot_interval

    seed = args.manualSeed
    if seed is None:
        seed = random.randint(1, 10000)
    random.seed(seed)
    np.random.seed(seed)

    now = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    output_dir = args.output_dir or os.path.join(
        "output", f"{cfg.DATASET_NAME}_{now}")
    os.makedirs(output_dir, exist_ok=True)
    # record the trace-time knobs next to the cfg snapshot: --bn_groups /
    # --bf16 change training dynamics but live outside the yml, so a
    # resumed run that forgets them would silently train differently
    # (ADVICE r3). Readers: the --resume check below + nn/blocks warnings.
    record_run_flags(output_dir, args.resume,
                     bn_groups=args.bn_groups, bf16=bool(args.bf16),
                     variant=args.variant, manualSeed=seed)
    # source snapshot (code/multi-mnist/main.py:71-76, attngan
    # main.py:144-151): the reference copies main/trainer/model/utils/
    # datasets + cfg into the output dir so every run is reproducible;
    # here the package sources that define the run are snapshotted.
    cfg_snapshot = os.path.join(output_dir, os.path.basename(args.cfg_file))
    if not (os.path.exists(cfg_snapshot)
            and os.path.samefile(args.cfg_file, cfg_snapshot)):
        shutil.copyfile(args.cfg_file, cfg_snapshot)
    if cfg.TRAIN.FLAG and not args.resume:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        snap = os.path.join(output_dir, "src_snapshot")
        for rel in ("cli", "models", "train", "losses", "nn", "ops", "data"):
            src = os.path.join(pkg_root, rel)
            if os.path.isdir(src):
                shutil.copytree(src, os.path.join(snap, rel),
                                dirs_exist_ok=True)

    if args.variant == "multi-mnist":
        run_mnist(args, cfg, output_dir, seed)
    elif args.variant == "clevr":
        run_clevr(args, cfg, output_dir, seed)
    elif args.variant in ("coco-stackgan-1", "coco-stackgan-2"):
        run_stackgan(args, cfg, output_dir, seed)
    elif args.variant == "damsm":
        run_damsm_pretrain(args, cfg, output_dir, seed)
    else:
        run_attngan(args, cfg, output_dir, seed)


def _stage1_modules(cfg, variant):
    from multiple_objects_gan_tpu.config.config import stage1_model_config
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    mcfg = stage1_model_config(cfg, variant)
    return mcfg, Stage1G(mcfg), Stage1D(mcfg)


def run_mnist(args, cfg, output_dir, seed):
    from multiple_objects_gan_tpu.data.datasets import (
        Loader, MultiMnistDataset, write_synthetic_multimnist)
    from multiple_objects_gan_tpu.train.loop import train

    mcfg, g, d = _stage1_modules(cfg, "multi-mnist")
    if cfg.TRAIN.FLAG:
        split_dir = os.path.join(cfg.DATA_DIR, "train", "normal")
        if not os.path.isdir(split_dir):
            if not args.synthetic:
                sys.exit(f"dataset not found at {split_dir} "
                         "(pass --synthetic to generate one)")
            write_synthetic_multimnist(cfg.DATA_DIR, n=512, split="train",
                                       seed=seed)
        ds = MultiMnistDataset(cfg.DATA_DIR, split="train")
        loader = Loader(ds, shuffle=True, seed=seed,
                        workers=int(cfg.WORKERS),
                        **shard_loader_kwargs(int(cfg.TRAIN.BATCH_SIZE)))
        train(cfg, mcfg, g, d, loader, output_dir, seed=seed,
              max_epochs=args.max_epochs,
              profile_dir=args.profile or None,
              resume_dir=args.resume or None)
    else:
        from multiple_objects_gan_tpu.cli.sample import sample_stage1
        sample_stage1(args, cfg, mcfg, g, output_dir, "multi-mnist", seed)


def run_clevr(args, cfg, output_dir, seed):
    from multiple_objects_gan_tpu.data.datasets import ClevrDataset, Loader
    from multiple_objects_gan_tpu.train.loop import train

    mcfg, g, d = _stage1_modules(cfg, "clevr")
    if cfg.TRAIN.FLAG:
        if not os.path.isdir(os.path.join(cfg.DATA_DIR, "train", "scenes")):
            if not args.synthetic:
                sys.exit(f"CLEVR data not found under {cfg.DATA_DIR} "
                         "(pass --synthetic to generate one)")
            from multiple_objects_gan_tpu.data.datasets import (
                write_synthetic_clevr)
            write_synthetic_clevr(cfg.DATA_DIR, n=256, split="train",
                                  seed=seed)
        ds = ClevrDataset(cfg.DATA_DIR, split="train",
                          imsize=int(cfg.IMSIZE), seed=seed)
        loader = Loader(ds, shuffle=True, seed=seed,
                        workers=int(cfg.WORKERS),
                        **shard_loader_kwargs(int(cfg.TRAIN.BATCH_SIZE)))
        train(cfg, mcfg, g, d, loader, output_dir, seed=seed,
              max_epochs=args.max_epochs,
              profile_dir=args.profile or None,
              resume_dir=args.resume or None)
    else:
        from multiple_objects_gan_tpu.cli.sample import sample_stage1
        sample_stage1(args, cfg, mcfg, g, output_dir, "clevr", seed)


def run_stackgan(args, cfg, output_dir, seed):
    stage = int(cfg.STAGE)
    if stage == 1:
        from multiple_objects_gan_tpu.data.coco import CocoStackganDataset
        from multiple_objects_gan_tpu.data.datasets import Loader
        from multiple_objects_gan_tpu.train.loop import train
        mcfg, g, d = _stage1_modules(cfg, "coco-stackgan")
        if not os.path.isfile(os.path.join(cfg.DATA_DIR, "train",
                                           "filenames.pickle")):
            if not args.synthetic:
                sys.exit(f"COCO data not found under {cfg.DATA_DIR} "
                         "(pass --synthetic to generate one)")
            from multiple_objects_gan_tpu.data.coco import (
                write_synthetic_coco)
            # at least 2 full batches, else the drop-last loader is empty
            write_synthetic_coco(cfg.DATA_DIR, cfg.IMG_DIR,
                                 n=max(2 * int(cfg.TRAIN.BATCH_SIZE), 64),
                                 seed=seed)
        ds = CocoStackganDataset(cfg.DATA_DIR, cfg.IMG_DIR, split="train",
                                 stage=1, imsize=int(cfg.IMSIZE))
        loader = Loader(ds, shuffle=True, seed=seed,
                        workers=int(cfg.WORKERS),
                        **shard_loader_kwargs(int(cfg.TRAIN.BATCH_SIZE)))
        train(cfg, mcfg, g, d, loader, output_dir, seed=seed,
              max_epochs=args.max_epochs,
              profile_dir=args.profile or None,
              resume_dir=args.resume or None)
    else:
        from multiple_objects_gan_tpu.cli.stage2_runner import run_stage2
        run_stage2(args, cfg, output_dir, seed)


def run_attngan(args, cfg, output_dir, seed):
    if args.synthetic and not os.path.isfile(
            os.path.join(cfg.DATA_DIR, "train", "filenames.pickle")):
        from multiple_objects_gan_tpu.data.attngan import (
            write_synthetic_attngan)
        write_synthetic_attngan(cfg.DATA_DIR, cfg.IMG_DIR,
                                n=max(2 * int(cfg.TRAIN.BATCH_SIZE), 32),
                                seed=seed)
    from multiple_objects_gan_tpu.cli.attngan_runner import run as run_a
    run_a(args, cfg, output_dir, seed)


def run_damsm_pretrain(args, cfg, output_dir, seed):
    if args.synthetic and not os.path.isfile(
            os.path.join(cfg.DATA_DIR, "train", "filenames.pickle")):
        from multiple_objects_gan_tpu.data.attngan import (
            write_synthetic_attngan)
        write_synthetic_attngan(cfg.DATA_DIR, cfg.IMG_DIR,
                                n=max(2 * int(cfg.TRAIN.BATCH_SIZE), 32),
                                seed=seed)
    from multiple_objects_gan_tpu.cli.damsm_runner import run_damsm
    run_damsm(args, cfg, output_dir, seed)


if __name__ == "__main__":
    main()
