"""Shared marginal-cost timer for the profiling tools.

Protocol (PERF_NOTES.md): per-dispatch latency through the axon tunnel is
~30-45 ms and identical-input executions may be cache-served, so only
marginal costs are trustworthy — jit chains of n2 vs n1 copies of the op
(with a real, non-foldable data dependency between copies: ``x * 0``
constant-folds and lets XLA CSE the chain) and time the difference.
The product-code variant for single-argument chains is
``utils/profiling.marginal_cost``.
"""

from __future__ import annotations

import time

import jax


def marginal(make_chain, args, n1=1, n2=3, reps=3):
    """Marginal per-op seconds for ``make_chain(n)`` applied to ``*args``."""
    f1 = jax.jit(make_chain(n1))
    f2 = jax.jit(make_chain(n2))

    def timeit(f):
        jax.block_until_ready(f(*args))
        t = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t) / reps

    return (timeit(f2) - timeit(f1)) / (n2 - n1)
