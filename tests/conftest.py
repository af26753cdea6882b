"""Test config: run everything on a virtual 8-device CPU mesh.

NOTE: this environment preimports jax via sitecustomize, so JAX_PLATFORMS
set here is too late — use jax.config.update instead. XLA_FLAGS is read at
(lazy) backend init, so setting it here still works as long as no test ran
a computation first.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU's collective rendezvous has a 20s-warn/40s-LOG(FATAL)
    # watchdog. Sharded steps over the 8 virtual devices run 8 partition
    # threads on however few cores the host has — on a busy 1-core CI
    # host the heavier steps (attngan CLI e2e) can legitimately take
    # >40s to get all 8 threads to an all-gather, and the watchdog then
    # SIGABRTs the whole pytest process. Raise it well past any real
    # step time; actual deadlocks still die at 20 min.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags.strip()

import hashlib  # noqa: E402
import platform  # noqa: E402
import sys  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def _host_fingerprint() -> str:
    """CPU cache entries embed host machine features; a stale entry
    loaded on a DIFFERENT host SIGABRTs mid-run (CLAUDE.md). Keying the
    cache dir by everything those entries depend on makes cross-run reuse
    safe: a new host/toolchain simply starts an empty dir."""
    import jaxlib

    bits = [platform.machine(), sys.version.split()[0], jax.__version__,
            getattr(jax, "__version_info__", ""),
            # jaxlib/XLA build identity: compiled-executable layout can
            # change across jaxlib builds even at the same jax version
            # (ADVICE r3) — a mismatch must start a fresh dir, because the
            # stale-entry failure mode is a hard SIGABRT mid-suite
            getattr(jaxlib, "__version__", ""),
            getattr(jax.lib, "xla_extension_version", "")]
    try:
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        for key in ("model name", "flags"):
            for line in txt.splitlines():
                if line.startswith(key):
                    bits.append(line)
                    break
    except OSError:
        bits.append(platform.processor())
    return hashlib.sha256("|".join(map(str, bits)).encode()).hexdigest()[:12]


# Persistent per-HOST-FINGERPRINT compile cache: several tests compile
# IDENTICAL jaxprs in separate jit closures (the attngan resume e2e
# recompiles the whole train step; CLI eval modes share generator
# graphs), and pjit's in-memory cache can't dedup across function
# objects — and the suite is compile-bound on CI (VERDICT r2 "weak" #7),
# so repeat runs on the same host should skip the big compiles entirely.
_cache_dir = os.path.expanduser(
    f"~/.cache/mog_test_jax_cache_{_host_fingerprint()}")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)

# GC stale fingerprint dirs (old hosts/toolchains never come back, and the
# dir family would otherwise grow without bound — ADVICE r3): keep the
# current dir plus the 2 most recently used others.
try:
    import shutil

    _family = os.path.expanduser("~/.cache")
    _siblings = sorted(
        (d for d in os.listdir(_family)
         if d.startswith("mog_test_jax_cache_")
         and os.path.join(_family, d) != _cache_dir),
        key=lambda d: os.path.getmtime(os.path.join(_family, d)),
        reverse=True)
    for _d in _siblings[2:]:
        shutil.rmtree(os.path.join(_family, _d), ignore_errors=True)
except OSError:
    pass
# Persist even sub-second compiles: the suite compiles hundreds of small
# jits (inits, eval fns) whose 0.5-5 s costs add up once the big train
# steps are cached. Measured (full warm suite, 1-core shared host):
# user CPU 15:39 -> 13:56 (-11%) after dropping this from 5.0 to 0.3;
# wall time on this host is contention-noisy (17:36-25:49 across warm
# runs), so CPU time is the honest metric. Remaining suite cost is test
# EXECUTION (multihost two-process gloo 120s, export tool 100s, ...),
# not compiles — see ROADMAP "suite wall time".
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} "
    f"on {jax.default_backend()}")
