"""Tracing/profiling + debug sanitizers (SURVEY.md §5 aux subsystems).

The reference uses PyTorch-Lightning Simple/AdvancedProfiler selected by
`--profiler` (`train_diffusion_smpl.py:585,641`) and leaves
`torch.autograd.set_detect_anomaly(True)` on globally (`:608`) — a costly
NaN sanitizer.  TPU equivalents:

  * :class:`StepTimer` — per-step wall-clock aggregation (SimpleProfiler).
  * :func:`trace` — `jax.profiler` trace context (AdvancedProfiler; view
    with TensorBoard or xprof).
  * :func:`enable_anomaly_detection` — `jax_debug_nans`, gated behind an
    explicit call instead of always-on (flagged in SURVEY.md §5 as a
    performance bug to keep behind a debug flag).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


def enable_anomaly_detection(enable: bool = True) -> None:
    """NaN/Inf sanitizer: re-runs offending jit computations eagerly and
    raises at the first non-finite output."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for everything inside the context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock aggregation by section (SimpleProfiler equivalent).

    >>> timer = StepTimer()
    >>> with timer("train_step"):
    ...     out = step(...)  # include block_until_ready for honest numbers
    >>> print(timer.summary())
    """

    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def summary(self) -> str:
        rows = ["section | calls | total_s | mean_ms"]
        for name in sorted(self._total, key=self._total.get, reverse=True):
            tot, n = self._total[name], self._count[name]
            rows.append(f"{name} | {n} | {tot:.3f} | {1e3 * tot / n:.2f}")
        return "\n".join(rows)

    def reset(self):
        self._total.clear()
        self._count.clear()
