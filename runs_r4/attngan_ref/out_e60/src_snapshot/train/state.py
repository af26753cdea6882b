"""Training state container for the GAN train loop."""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct


@struct.dataclass
class GANTrainState:
    """All mutable training state, one pytree (jit- and shard-friendly).

    Mirrors what the reference keeps across steps: G/D params + optimizers
    (trainer.py:98-99), BatchNorm running stats (inside torch modules), the
    step counter, and — for attngan — the EMA copy of G params
    (code/coco/attngan/trainer.py:341-342).
    """

    step: jax.Array
    g_params: Any
    d_params: Any
    g_stats: Any
    d_stats: Any
    g_opt: Any
    d_opt: Any
    g_ema: Optional[Any] = None
