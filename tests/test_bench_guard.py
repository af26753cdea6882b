"""bench.py wedge-guard: the parent retries hung/signal-killed attempts.

The tunneled TPU backend intermittently wedges (frozen CPU time, sometimes
before backend init — CLAUDE.md); the driver runs `python bench.py` once
per round, so a single wedge must not eat the round's benchmark artifact.
Mechanics are tested with a stubbed subprocess.run — no TPU, no compile.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class _Proc:
    def __init__(self, returncode):
        self.returncode = returncode


def test_guard_retries_on_timeout(monkeypatch):
    calls = []

    def fake_run(cmd, timeout=None, env=None):
        calls.append(env.get("MOG_BENCH_CHILD"))
        if len(calls) < 3:
            raise subprocess.TimeoutExpired(cmd, timeout)
        return _Proc(0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench.run_guarded(attempts=3, timeout_s=1.0) == 0
    assert calls == ["1", "1", "1"]  # child flag set on every attempt


def test_guard_retries_on_signal_death(monkeypatch):
    rcs = iter([-6, 0])  # SIGABRT then success

    monkeypatch.setattr(subprocess, "run",
                        lambda cmd, timeout=None, env=None: _Proc(next(rcs)))
    assert bench.run_guarded(attempts=2, timeout_s=1.0) == 0


def test_guard_propagates_clean_failure_without_retry(monkeypatch):
    calls = []

    def fake_run(cmd, timeout=None, env=None):
        calls.append(1)
        return _Proc(3)  # clean nonzero exit (e.g. the sanity assert)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench.run_guarded(attempts=3, timeout_s=1.0) == 3
    assert len(calls) == 1


def test_guard_gives_up_after_all_wedges(monkeypatch):
    def fake_run(cmd, timeout=None, env=None):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench.run_guarded(attempts=2, timeout_s=1.0) == 124
