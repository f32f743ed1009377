"""Structured metrics logging: stdout + JSONL + best-val ledger.

Replaces the reference's per-run `.txt` logs and repo-root `eval_results.txt` ledger
(`train_classification.py:51-76`, `eval_classification.py:41-61`) with the same
observable artifacts plus machine-readable JSONL and images/sec/step-time counters
(SURVEY §5.5). All writes are process-0 gated.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional

import jax


class MetricsLogger:
    def __init__(self, log_dir: str, run_name: str, to_stdout: bool = True,
                 tb: bool = False):
        self.primary = jax.process_index() == 0
        self.to_stdout = to_stdout
        self.txt_path = os.path.join(log_dir, f"{run_name}.txt")
        self.jsonl_path = os.path.join(log_dir, f"{run_name}.jsonl")
        if self.primary:
            os.makedirs(log_dir, exist_ok=True)
        self._t0 = time.time()
        # optional TensorBoard sink (the reference's SummaryWriter scalars,
        # `main_pretrain.py:237-239`, `main_moco.py:233`) via the
        # dependency-free core.tb writer
        self._tb = None
        if tb and self.primary:
            from ssl4gie_tpu.core.tb import SummaryWriter
            self._tb = SummaryWriter(os.path.join(log_dir, "tb", run_name))
        self._tb_step = 0

    def log(self, payload: Dict[str, Any], echo: Optional[str] = None) -> None:
        if not self.primary:
            return
        payload = dict(payload, wall_s=round(time.time() - self._t0, 3))
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(payload, default=float) + "\n")
        if self._tb is not None:
            self._tb_step = int(payload.get("step", payload.get(
                "epoch", self._tb_step + 1)))
            for k, v in payload.items():
                if k not in ("step", "epoch", "wall_s") and isinstance(
                        v, (int, float)):
                    self._tb.add_scalar(k, float(v), self._tb_step)
            self._tb.flush()
        line = echo if echo is not None else " ".join(
            f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in payload.items())
        with open(self.txt_path, "a") as f:
            f.write(line + "\n")
        if self.to_stdout:
            print(line, flush=True)

    def write_args(self, args: Dict[str, Any]) -> None:
        """Dump run config at start (reference prints args at `:282-284`)."""
        if not self.primary:
            return
        with open(self.txt_path, "a") as f:
            f.write(json.dumps(args, default=str) + "\n")


def append_eval_results(root: str, header: str, lines: list[str]) -> None:
    """Append to the shared eval_results.txt ledger with a timestamped header,
    matching `eval_classification.py:41-61` observable behavior."""
    if jax.process_index() != 0:
        return
    path = os.path.join(root, "eval_results.txt")
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(path, "a") as f:
        f.write(f"\n[{stamp}] {header}\n")
        for ln in lines:
            f.write(ln + "\n")


class Throughput:
    """images/sec and step-time meter (the north-star counter, SURVEY §5.1)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t = time.perf_counter()
        self._images = 0
        self._steps = 0

    def update(self, batch_size: int, steps: int = 1):
        """batch_size: TOTAL images just processed (across `steps` steps —
        the pretrain loop dispatches scan_steps steps per python call)."""
        self._images += batch_size
        self._steps += steps

    def rates(self, remaining_steps: Optional[int] = None) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t, 1e-9)
        out = {"images_per_sec": self._images / dt,
               "step_time_ms": 1000.0 * dt / max(self._steps, 1)}
        if remaining_steps is not None:
            # epoch ETA from the running mean step time (the reference
            # MetricLogger's `eta:` field, `Models/mae/util/misc.py:140-151`)
            out["eta_s"] = round(remaining_steps * dt / max(self._steps, 1), 1)
        return out


def peak_memory_mb() -> Optional[float]:
    """Peak device memory in use, MB (the reference's per-epoch
    `torch.cuda.max_memory_allocated` meter, `Models/mae/util/misc.py:164-167`).
    None where the backend exposes no memory_stats (CPU)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if stats and "peak_bytes_in_use" in stats:
        return round(stats["peak_bytes_in_use"] / 2**20, 1)
    return None
