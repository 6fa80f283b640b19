"""Training metrics: running averages, step timing, and structured logging.

The reference logs per-epoch scalars to TensorBoard (last batch only — a
quirk, ``model/train_posendf.py:104-106``) and aggregates epoch loss with an
AverageMeter (``model/loss_utils.py:4-22``). Here: the same running-average
aggregation, plus a JSONL event log (always available, greppable, no protobuf
dependency) and an optional TensorBoard writer when the package exists.
Throughput counters (poses/sec, step time) are first-class since they are the
benchmark currency (BASELINE.md north stars).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

__all__ = ["RunningAverage", "MetricsLogger"]


class RunningAverage:
    """val/sum/count/avg running aggregate (the AverageMeter capability)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class MetricsLogger:
    """JSONL metrics sink + optional TensorBoard mirror."""

    def __init__(self, directory: str, use_tensorboard: bool = True):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # optional

                self._tb = SummaryWriter(os.path.join(directory, "summary"))
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, scalars: Dict[str, float], prefix: str = "train"):
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        rec.update({f"{prefix}/{k}": float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
