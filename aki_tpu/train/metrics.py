"""Training metrics: TensorBoard scalars + JSONL + step timing.

Reference parity: rank-0 ``SummaryWriter`` with ``training_loss`` /
``learning_rate`` scalars (``train/train.py:278-281``,
``train_utils.py:280-283``) and AverageMeter step/data timers
(``train_utils.py:105-107``).  JSONL is the always-on fallback (no torch
dependency needed to read it), and ``jax.profiler`` trace capture is a
first-class hook — the TPU-native superset of the reference's timers.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0
        self.avg = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class MetricsLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True,
                 is_main: bool = True):
        self.is_main = is_main
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = (self.run_dir / "metrics.jsonl").open("a") if is_main else None
        self._tb = None
        if use_tensorboard and is_main:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.run_dir / "tb"))
            except Exception:  # noqa: BLE001 — TB optional
                self._tb = None

    def log(self, step: int, **scalars):
        if not self.is_main:
            return
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            rec[k] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start+num)."""

    def __init__(self, run_dir: str, start_step: int = -1, num_steps: int = 3):
        self.dir = str(Path(run_dir) / "profile")
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def step(self, step: int):
        if step == self.start and not self._active:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif step == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
