"""Preemption detection + checkpoint-and-requeue (TPU-native submitit analogue).

The reference's only elastic-recovery story is vendored submitit: SLURM signals
the job before preemption and submitit's `checkpoint()` hook resubmits the same
command with `--resume` pointing at the last checkpoint
(`Models/mae/submitit_pretrain.py:60-70`). Cloud TPU preemption works the same
way at the process level — the VM gets SIGTERM with a grace window — so the
TPU-native equivalent is:

1. `PreemptionGuard` latches SIGTERM / SIGUSR1 (SLURM's default notify signal
   is configurable; USR1 covers `--signal=USR1@60` setups) into a flag.
2. The training loops poll the flag at step/epoch boundaries; when set they
   save a full resume checkpoint and raise `Preempted`.
3. The CLI converts `Preempted` into exit code `REQUEUE_EXIT_CODE` (42). The
   supervisor (SLURM requeue, k8s restartPolicy, xmanager, a shell loop)
   relaunches the identical command; the trainer's auto-resume
   (`Trainer.maybe_resume`) picks the run up from the saved state, exactly as
   the reference's auto-resume does on restart (`train_classification.py:210-217`).

Process-0 gating mirrors rank-0 checkpointing: every process latches the
signal (all of them must exit), but only process 0 writes.
"""

from __future__ import annotations

import signal
from typing import Iterable

REQUEUE_EXIT_CODE = 42

_DEFAULT_SIGNALS = (signal.SIGTERM, signal.SIGUSR1)


class Preempted(Exception):
    """Raised by training loops after the preemption checkpoint is written."""


class PreemptionGuard:
    """Latches termination signals into a poll-able flag.

    Use as a context manager so the previous handlers are restored (pytest and
    nested trainers install their own):

        with PreemptionGuard() as guard:
            ...
            if guard.should_stop:
                save(); raise Preempted()
    """

    def __init__(self, signals: Iterable[int] = _DEFAULT_SIGNALS):
        self.signals = tuple(signals)
        self._flag = False
        self._prev = {}

    # -- context management -------------------------------------------------
    def __enter__(self):
        for s in self.signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except (ValueError, OSError):   # non-main thread / unsupported
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            try:
                signal.signal(s, prev)
            except (ValueError, OSError):
                pass
        self._prev.clear()
        return False

    def _handler(self, signum, frame):
        self._flag = True

    @property
    def should_stop(self) -> bool:
        return self._flag

    def trigger(self):
        """Programmatic preemption (tests, external watchers)."""
        self._flag = True
