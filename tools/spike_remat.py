"""Remat policy A/B on the HBM-bound train steps (VERDICT r3 next #4).

Both the mnist and attngan steps sit at the HBM roofline with 2-4x MXU
headroom (ROADMAP "Per-variant rooflines") — rematerialization trades
recompute FLOPs for saved-activation bytes, the one textbook lever not
yet measured with policies. Runs tools/bench_variants.py in a fresh
subprocess per MOG_REMAT mode (the knob is read at trace time) so each
gets a clean jit cache, sequentially (one TPU job at a time).

Prints one JSON line per (mode, variant) and a final summary table.
Usage: python tools/spike_remat.py [mnist attngan ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

MODES = ("0", "full", "convs", "dots")


def main(argv=None) -> None:
    variants = (argv or sys.argv[1:]) or ["mnist", "attngan"]
    here = os.path.dirname(os.path.abspath(__file__))
    results: dict = {}
    for mode in MODES:
        env = dict(os.environ, MOG_REMAT=mode)
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench_variants.py"),
             *variants],
            env=env, capture_output=True, text=True, timeout=3000)
        if proc.returncode != 0:
            print(f"mode={mode}: bench failed\n{proc.stderr[-2000:]}",
                  flush=True)
            continue
        for line in proc.stdout.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            r = json.loads(line)
            r["remat"] = mode
            results[(mode, r["variant"])] = r
            print(json.dumps(r), flush=True)

    print(f"\n{'variant':<18} {'remat':<6} {'ms':>8} {'img/s':>9} "
          f"{'MFU':>6} {'HBM':>6} {'GB/step':>8}")
    for (mode, var), r in sorted(results.items(), key=lambda kv: (
            kv[0][1], MODES.index(kv[0][0]))):
        print(f"{var:<18} {mode:<6} {r['step_ms']:>8.2f} "
              f"{r['img_per_sec']:>9.1f} {r['mfu']:>6.3f} "
              f"{r['hbm_util']:>6.3f} {r['gbytes_per_step']:>8.2f}")


if __name__ == "__main__":
    main()
