"""Measure SORT_STABLE=True vs False for the production merge sort on TPU.

``jax.lax.sort`` stability costs extra bitonic passes; the z-buffer's
winner semantics don't need them (see the SORT_STABLE comment in
ops/zbuffer_pallas.py).  This times the full stats merge
(sort + kernel, marginal-cost protocol) under both settings so the
constant can be pinned by measurement.

Run when the chip is free:  python tools/profile_sort_stable.py
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simultaneous_diffusion_for_pointclouds_tpu.ops import zbuffer_pallas as zp
from tools._marginal import marginal


def time_stats(stable: bool, views: int = 8) -> float:
    zp.SORT_STABLE = stable
    # the merge is module-level jitted: drop cached executables so the
    # constant is re-read at trace time
    zp.zbuffer_stats_sorted_batched_pallas.clear_cache()
    h, w, big = 64, 1024, 114
    A = views
    m = A * h * w
    live = big * w
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, live, (A, m)), jnp.int32)
    value = jnp.asarray(rng.uniform(0.05, 1.0, (A, m)), jnp.float32)
    p1 = jnp.asarray(rng.uniform(-1, 1, (A, m)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(A, m)) > 0.2)

    def make(n):
        def f(v):
            for _ in range(n):
                st = zp.zbuffer_stats_sorted_batched_pallas(
                    keys, v, p1, valid, live + 1
                )
                fb = sum(c.reshape(A, -1)[:, : h * w] for c in st)
                v = v + 1e-20 * fb.reshape(A, h * w).repeat(A, axis=1)[:, :m]
            return v

        return f

    # new input array per call so the axon cache can't serve a stale result
    return marginal(make, (value,))


def main() -> None:
    for stable in (True, False):
        ms = time_stats(stable) * 1e3
        print(f"SORT_STABLE={stable}: stats merge marginal {ms:.2f} ms")


if __name__ == "__main__":
    main()
