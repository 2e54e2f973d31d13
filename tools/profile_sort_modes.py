"""Measure the round-4 sort-payload-routing lever on the real TPU.

Three marginal-cost comparisons at the flagship shapes (PERF_NOTES
protocol — chained copies with real data dependencies):

1. merge stats sort+kernel (zbuffer_stats_sorted_batched_pallas, 1 payload):
   carry (3 sort operands) vs iota (3 operands + 1 gather)
2. merge min2 sort+kernel (zbuffer_min2_batched_pallas, 2 payloads):
   carry (4 operands) vs iota (3 operands + 2 gathers)
3. second-method renumber sort (5 operands, num_keys=1) vs iota
   (2 operands + 4 gathers), isolated at the 524k-id shape

Run AFTER training frees the chip:  python tools/profile_sort_modes.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simultaneous_diffusion_for_pointclouds_tpu.ops import zbuffer_pallas as zp
from tools._marginal import marginal


def merge_case(which: str, views=8):
    h, w, big = 64, 1024, 114
    A = views
    m = A * h * w  # per-target-view stream (batched rows)
    live = big * w
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, live, (A, m)), jnp.int32)
    value = jnp.asarray(rng.uniform(0.05, 1.0, (A, m)), jnp.float32)
    p1 = jnp.asarray(rng.uniform(-1, 1, (A, m)), jnp.float32)
    p2 = jnp.asarray(rng.integers(0, 1 << 20, (A, m)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(A, m)) > 0.2)

    def make(n):
        def f(v):
            for _ in range(n):
                if which == "stats":
                    st = zp.zbuffer_stats_sorted_batched_pallas(
                        keys, v, p1, valid, live + 1
                    )
                    fb = sum(c.reshape(A, -1)[:, : h * w] for c in st)
                else:
                    st = zp.zbuffer_min2_batched_pallas(
                        keys, v, p1, p2, valid, live + 1
                    )
                    fb = sum(
                        c.reshape(-1)[: A * m].reshape(A, m) for c in st
                    )[:, : h * w]
                v = v.at[:, : h * w].add(1e-20 * fb.reshape(A, h * w))
            return v

        return f

    return make, (value,)


def renumber_case():
    BN = 8 * 64 * 1024
    rng = np.random.default_rng(1)
    ids = jnp.asarray(np.sort(rng.integers(0, BN, BN)), jnp.int32)
    c0 = jnp.asarray(rng.uniform(-1, 1, BN), jnp.float32)
    c1 = jnp.asarray(rng.uniform(-1, 1, BN), jnp.float32)
    c2 = jnp.asarray(rng.uniform(-1, 1, BN), jnp.float32)
    c3 = jnp.asarray(rng.uniform(-1, 1, BN), jnp.float32)

    def make_carry(n):
        def f(v):
            for _ in range(n):
                sid, s0, s1, s2, s3 = jax.lax.sort(
                    (ids, c0 + v, c1, c2, c3), num_keys=1
                )
                v = v + 1e-20 * (s0 + s1 + s2 + s3 + sid.astype(jnp.float32))
            return v

        return f

    def make_iota(n):
        def f(v):
            for _ in range(n):
                sid, perm = jax.lax.sort(
                    (ids + (v[:1] * 0).astype(jnp.int32), jnp.arange(BN, dtype=jnp.int32)),
                    num_keys=1,
                )
                s0 = (c0 + v)[perm]
                s1, s2, s3 = c1[perm], c2[perm], c3[perm]
                v = v + 1e-20 * (s0 + s1 + s2 + s3 + sid.astype(jnp.float32))
            return v

        return f

    return make_carry, make_iota, (c0,)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    for which in ("stats", "min2"):
        for mode in ("carry", "iota"):
            for stable in (True, False):
                zp.SORT_PAYLOAD_MODE = mode
                zp.SORT_STABLE = stable
                make, args = merge_case(which)
                t = marginal(make, args)
                print(
                    f"merge {which:6s} {mode:6s} stable={int(stable)}:"
                    f" {t*1e3:8.2f} ms",
                    flush=True,
                )
        zp.SORT_PAYLOAD_MODE = "carry"
        zp.SORT_STABLE = True

    make_carry, make_iota, args = renumber_case()
    for name, mk in (("carry", make_carry), ("iota", make_iota)):
        t = marginal(mk, args)
        print(f"renumber sort {name:6s}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
