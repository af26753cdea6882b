"""Scalar metric logging (tensorboard-compatible when TF is present).

Parity target: the reference's tensorboard scalars every 500 steps
(code/multi-mnist/trainer.py:163-174). Falls back to a JSONL file when
TensorBoard isn't available, so logging never blocks training.
"""

from __future__ import annotations

import json
import os
import time


class MetricWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # cpu torch
            self._tb = SummaryWriter(logdir)
        except Exception:
            pass
        self._f = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def scalars(self, step: int, values: dict) -> None:
        rec = {"step": step, "time": time.time(), **values}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
