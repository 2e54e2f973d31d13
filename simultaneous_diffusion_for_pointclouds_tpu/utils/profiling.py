"""Profiling helpers.

The reference's only instrumentation is wall-clock around sampler calls
(``*_TimeTaken.npy``).  Here: the same accumulation (in the sampling
runner), plus a reusable timer and an optional XLA trace context.

TPU timing caveat (see PERF_NOTES.md): per-dispatch latency through the
PJRT tunnel is ~30-45 ms and identical-input executions may be cached, so
meaningful op costs must be measured as *marginal* cost — jit chains of N
vs M copies and divide the difference.  :func:`marginal_cost` does that.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


class Timer:
    """Accumulating named wall-clock sections."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync: bool = False):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                jax.effects_barrier()
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - start
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: {"total_s": v, "mean_s": v / max(self.counts[k], 1)}
            for k, v in self.totals.items()
        }


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """jax.profiler trace when a directory is given (may be unsupported on
    tunneled backends — degrades to a no-op)."""
    if not log_dir:
        yield
        return
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:  # pragma: no cover - backend-dependent
        yield


def marginal_cost(make_chain: Callable[[int], Callable], arg, n1: int = 1, n2: int = 5,
                  reps: int = 3) -> float:
    """Marginal per-op seconds: time jitted chains of n2 vs n1 ops.

    ``make_chain(n)`` must return a function applying the op n times with a
    data dependency between applications.
    """
    f1 = jax.jit(make_chain(n1))
    f2 = jax.jit(make_chain(n2))

    def run(f):
        float(jnp.sum(f(arg)))  # warm/compile
        t = time.perf_counter()
        for _ in range(reps):
            float(jnp.sum(f(arg)))
        return (time.perf_counter() - t) / reps

    return (run(f2) - run(f1)) / (n2 - n1)
