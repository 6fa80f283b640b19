"""Profiling and debugging hooks.

The reference has no profiler integration at all (SURVEY.md §5 — an unused
``import time``). Here: ``jax.profiler`` traces behind a flag (TensorBoard-
viewable), lightweight step timers, and the NaN-debugging switch the
reference approximated with ~20 commented-out ``isnan`` ipdb traces
(``model/posendf.py:67-68,91-92``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

__all__ = ["trace", "StepTimer", "enable_nan_debugging"]


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging() -> None:
    """Make any NaN produced under jit raise immediately (jax.debug_nans) —
    the principled version of the reference's commented isnan traces."""
    import jax

    jax.config.update("jax_debug_nans", True)


class StepTimer:
    """Cheap wall-clock step timer with an exponential moving average."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (1 - self.alpha) * self.ema + self.alpha * dt
        return dt
