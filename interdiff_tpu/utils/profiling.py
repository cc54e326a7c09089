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


def slope_time(op, x0, *, k_lo: int = 1, k_hi: int = 9, reps: int = 5
               ) -> float:
    """Per-op milliseconds by SLOPE: run ``op`` K-chained inside one jitted
    ``fori_loop`` at ``k_lo`` and ``k_hi`` dispatches and return
    ``(t_hi - t_lo) / (k_hi - k_lo)``.

    This cancels the per-dispatch fixed cost (tunnel RTT + launch overhead,
    ~1-2 ms over the axon tunnel) that makes standalone-dispatch timing
    overstate small ops by an order of magnitude (round-3 verdict item 5:
    a "14 ms" AdamW whose HBM roofline cost is ~0.3 ms).  Each outer rep
    gets a uniquely perturbed input — the axon tunnel memoizes results by
    argument value, so identical repeat dispatches report absurd sub-ms
    times — and the perturbation base is SALTED per process: the memo
    survives across processes, so a rerun of the same script with the old
    deterministic perturbations got every (executable, args) pair served
    from the cache (observed: a 14.6 ms train step "measuring" 0.73 ms on
    the second run of the day).

    Measurement discipline (learned the hard way on the tunnel):

      * every dispatch is individually ``block_until_ready``-ed — letting
        reps queue asynchronously and blocking only on the last one
        reported physically impossible numbers (9-chained encoder
        fwd+bwd "completing" in 0.12 ms) because the tunnel acks queued
        work long before it executes;
      * the per-rep statistic is the MEDIAN, not the mean — a single
        tunnel hiccup (observed: a 55 ms outlier on a ~1 ms AdamW
        dispatch) otherwise drives the slope negative.

    The per-dispatch block costs one RTT per rep, but the RTT is the
    same at ``k_lo`` and ``k_hi`` so it cancels in the slope exactly like
    the launch overhead does.

    ``op`` maps the carry pytree to any output pytree; a tiny data
    dependency on the output is folded back into the carry to keep chained
    iterations sequential without changing the carried value.
    """
    import os
    import statistics

    import jax.numpy as jnp

    # fresh per call: no two processes (or two calls) ever dispatch the
    # same (executable, args) pair, so the tunnel memo can never hit
    salt = 1.0 + int.from_bytes(os.urandom(4), "little") / 2**33

    def _is_float(v):
        return hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)

    def _mix(x, out):
        leaves = [l for l in jax.tree.leaves(out) if _is_float(l)]
        s = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
        return jax.tree.map(
            lambda v: v * (1.0 + 1e-12 * s) if _is_float(v) else v, x)

    def _perturb(x, eps):
        return jax.tree.map(
            lambda v: v * (1.0 + eps) if _is_float(v) else v, x)

    def run_k(k):
        @jax.jit
        def g(x):
            return jax.lax.fori_loop(0, k, lambda _, x: _mix(x, op(x)), x)

        variants = [_perturb(x0, 1e-6 * salt * (i + k))
                    for i in range(reps + 1)]
        jax.block_until_ready(g(variants[0]))  # compile + warm
        times = []
        for v in variants[1:]:
            t0 = time.perf_counter()
            jax.block_until_ready(g(v))
            times.append((time.perf_counter() - t0) * 1e3)
        return statistics.median(times)

    t_lo, t_hi = run_k(k_lo), run_k(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo)


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
