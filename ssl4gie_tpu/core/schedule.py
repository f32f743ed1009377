"""Host-side LR schedules.

- ReduceLROnPlateau: behavioral match of torch.optim.lr_scheduler.ReduceLROnPlateau as
  the reference uses it (factor=0.5, patience=10 default, min_lr=1e-6, mode max/min,
  stepped once per epoch on the validation metric — `train_classification.py:287-310`).
  It is inherently data-dependent, so it runs on host and writes the new LR into the
  optimizer's injected hyperparams.
- Cosine-with-warmup: per-iteration schedule for SSL pretraining, matching the vendored
  recipes (`Models/mae/util/lr_sched.py:9-21`, `main_moco.py:420-428`). Implemented as a
  pure function usable inside jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass
class ReduceLROnPlateau:
    mode: str = "max"                 # 'max' for Dice/F1/mAP, 'min' for depth loss
    factor: float = 0.5
    patience: int = 10
    min_lr: float = 1e-6
    threshold: float = 1e-4           # torch default, rel mode
    best: Optional[float] = None
    num_bad_epochs: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed one epoch's validation metric; return the (possibly reduced) LR."""
        # torch semantics: rel threshold; best tracked separately from ckpt-best
        if self.best is None or self._better(metric, self.best):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return lr

    def _better(self, a: float, best: float) -> bool:
        # torch 'rel' threshold mode semantics
        if self.mode == "max":
            return a > best * (1.0 + self.threshold)
        return a < best * (1.0 - self.threshold)

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.best = d.get("best")
        self.num_bad_epochs = int(d.get("num_bad_epochs", 0))


def cosine_warmup_lr(step, *, base_lr: float, warmup_steps: int, total_steps: int,
                     min_lr: float = 0.0):
    """Per-step warmup + half-cosine decay (vendored MAE/MoCo recipe). jit-safe."""
    step = jnp.asarray(step, jnp.float32)
    warm = base_lr * step / jnp.maximum(warmup_steps, 1)
    progress = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
    cos = min_lr + (base_lr - min_lr) * 0.5 * (1.0 + jnp.cos(math.pi * progress))
    return jnp.where(step < warmup_steps, warm, cos)


def cosine_momentum(step, *, base_m: float, total_steps: int):
    """MoCo v3 cosine-increasing EMA momentum (`main_moco.py:431-434`)."""
    step = jnp.asarray(step, jnp.float32)
    return 1.0 - (1.0 - base_m) * 0.5 * (1.0 + jnp.cos(math.pi * step / total_steps))
