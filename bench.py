"""Headline benchmark: Multi-MNIST 64px training throughput (images/sec/chip).

Baseline target (BASELINE.md): >= 3000 images/sec/chip on TPU v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measurement notes (round-2 fix): `jax.block_until_ready` on a donated
buffer does NOT reliably synchronize through the tunneled-TPU backend, so
each timing round ends by fetching a computed scalar (the last step's
d_loss) to the host — a device->host transfer cannot complete before the
step that produced it. We also report MFU against the v5e peak and assert
the measured rate is physically possible given XLA's own FLOP count for
the compiled step.

Wedge guard: the tunneled backend intermittently WEDGES (the process
blocks forever with frozen CPU time, sometimes before backend init
completes — see CLAUDE.md); a retry usually succeeds. Run as a script,
this file therefore execs the actual measurement in a timed subprocess
and retries on hang, so one wedge cannot eat the whole benchmark run.
The parent deliberately imports no jax.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_IMG_PER_SEC = 3000.0
# v5e peak: 197 TFLOP/s bf16 (f32 matmuls route through bf16 passes).
V5E_PEAK_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp
    import jax.numpy as _jnp

    from multiple_objects_gan_tpu.nn import blocks

    # TPU-idiomatic mixed precision: bf16 activations end-to-end (incl.
    # STN resampling and BN normalize; master weights and BN statistics
    # stay f32). Measured ~1.5x over f32 with an unchanged loss
    # trajectory; opt out with MOG_COMPUTE_DTYPE=float32.
    if os.environ.get("MOG_COMPUTE_DTYPE", "").lower() not in ("f32",
                                                               "float32"):
        blocks.set_compute_dtype(_jnp.bfloat16)

    from multiple_objects_gan_tpu.data.synthetic import synthetic_batch
    from multiple_objects_gan_tpu.models import common
    from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
    from multiple_objects_gan_tpu.train.step import (
        create_state, make_train_step)

    cfg = common.MNIST  # full reference width: GF_DIM=128, DF_DIM=64
    batch_size = 128    # reference cfg/mnist_train.yml TRAIN.BATCH_SIZE
    g, d = Stage1G(cfg), Stage1D(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, g, d, rng, batch_size=2)
    step = jax.jit(make_train_step(cfg, g, d), donate_argnums=(0,))
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch_size).items()}
    lr = jnp.float32(2e-4)

    # XLA's own FLOP count for one compiled step (for MFU + sanity check).
    compiled = step.lower(state, batch, rng, lr, lr).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops_per_step = float(cost.get("flops", 0.0))

    # warmup / compile
    for _ in range(3):
        state, metrics = step(state, batch, rng, lr, lr)
    float(metrics["d_loss"])  # full device->host sync

    # best of 3 timing rounds (guards against transient host contention);
    # each round syncs by fetching the LAST step's d_loss: steps chain on
    # state, so that scalar depends on every step in the round.
    n_steps = 30
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch, rng, lr, lr)
        sync = float(metrics["d_loss"])
        best_dt = min(best_dt, time.perf_counter() - t0)
    assert jnp.isfinite(sync), "non-finite loss in bench step"

    n_chips = jax.device_count()
    img_per_sec_per_chip = n_steps * batch_size / best_dt / n_chips
    achieved_flops = flops_per_step * n_steps / best_dt / n_chips
    mfu = achieved_flops / V5E_PEAK_FLOPS
    # Physical-sanity check: measured rate must be below chip peak.
    assert achieved_flops < V5E_PEAK_FLOPS, (
        f"measured {achieved_flops/1e12:.1f} TFLOP/s/chip exceeds v5e peak "
        f"{V5E_PEAK_FLOPS/1e12:.0f} — timing is not synchronizing")
    print(json.dumps({
        "metric": "multi_mnist_train_throughput",
        "value": round(img_per_sec_per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec_per_chip / BASELINE_IMG_PER_SEC, 3),
        "mfu": round(mfu, 4),
        "tflops_per_step": round(flops_per_step / 1e12, 4),
        "step_ms": round(best_dt / n_steps * 1000, 3),
        "variants": bench_variants_extra(),
    }))


def bench_variants_extra() -> dict:
    """Per-variant train-step benches attached to the tracked JSON line so
    cross-round regressions on the big models are driver-visible (VERDICT
    r4 weak #5): the primary metric name/meaning is unchanged; these ride
    as an extra key. Each variant is individually guarded — a wedge or
    OOM in one leaves `{"error": ...}` for it rather than killing the
    headline number. Skip entirely with MOG_BENCH_VARIANTS=0."""
    if os.environ.get("MOG_BENCH_VARIANTS", "1") in ("0", "false"):
        return {}
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_variants",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "tools", "bench_variants.py"))
    bv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bv)
    out = {}
    for name, fn in (("clevr", bv.bench_clevr),
                     ("coco-stackgan-2", bv.bench_stage2),
                     ("coco-attngan", bv.bench_attngan)):
        try:
            row = fn()
            row.pop("variant", None)
            out[name] = row
        except Exception as e:  # noqa: BLE001 — report, don't kill bench
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
    return out


def run_guarded(attempts: int = 3, timeout_s: float = 0.0) -> int:
    """Run main() in a timed subprocess; retry on wedge (hang/kill).

    Returns the exit code to propagate. Output passes through unchanged
    (the driver reads the JSON line from stdout). A genuine bench
    failure (clean nonzero exit with output) is NOT retried — only
    hangs and signal deaths, the tunnel-wedge signatures, are.
    """
    import subprocess

    # the variants table adds up to three cold compiles (1-5 min each on
    # the tunneled backend) — budget for them unless it's disabled
    default_to = ("900" if os.environ.get("MOG_BENCH_VARIANTS", "1")
                  in ("0", "false") else "2700")
    timeout_s = timeout_s or float(os.environ.get("MOG_BENCH_TIMEOUT",
                                                  default_to))
    env = dict(os.environ, MOG_BENCH_CHILD="1")
    for attempt in range(1, attempts + 1):
        try:
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  timeout=timeout_s, env=env)
        except subprocess.TimeoutExpired:
            print(f"bench attempt {attempt}/{attempts} wedged after "
                  f"{timeout_s:.0f}s (tunneled-backend hang) — retrying",
                  file=sys.stderr, flush=True)
            continue
        if proc.returncode == 0:
            return 0
        if proc.returncode < 0:  # killed by signal (SIGABRT/SIGSEGV/...)
            print(f"bench attempt {attempt}/{attempts} died with signal "
                  f"{-proc.returncode} — retrying", file=sys.stderr,
                  flush=True)
            continue
        return proc.returncode
    print(f"bench failed: all {attempts} attempts wedged", file=sys.stderr,
          flush=True)
    return 124


if __name__ == "__main__":
    if os.environ.get("MOG_BENCH_CHILD"):
        main()
    else:
        sys.exit(run_guarded())
