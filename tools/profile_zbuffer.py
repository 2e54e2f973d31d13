"""Compare z-buffer implementations on the real TPU at flagship scale.

Outputs are fed back into the next chain link through gathers at the input
keys so XLA cannot elide any of the five dense images.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simultaneous_diffusion_for_pointclouds_tpu.ops import scatter


def marginal(make_chain, args, n1=1, n2=3):
    f1 = jax.jit(make_chain(n1))
    f2 = jax.jit(make_chain(n2))

    def timeit(f):
        jax.block_until_ready(f(*args))
        t = time.perf_counter()
        for _ in range(3):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t) / 3

    return (timeit(f2) - timeit(f1)) / (n2 - n1)


def main(views=8):
    h, w, big = 64, 1024, 114
    A = views
    E = A * A * h * w
    S = A * big * w + 1
    print(f"E={E} S={S}", flush=True)
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, S - 1, E), jnp.int32)
    value = jnp.asarray(rng.uniform(0, 1, E), jnp.float32)
    payload = jnp.asarray(rng.uniform(-1, 1, E), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=E) > 0.2)

    def chain(impl):
        def make(n):
            def f(v):
                for _ in range(n):
                    st = impl(keys, v, payload, valid, S)
                    fb = (st.sum_value[keys] + st.sum_payload[keys] + st.count[keys]
                          + st.min_value[keys] + st.min_payload[keys])
                    v = v + 1e-20 * fb
                return v
            return f
        return make

    for name in ["zbuffer_stats_sorted", "zbuffer_stats_sorted_v3"]:
        impl = getattr(scatter, name)
        ms = marginal(chain(impl), (value,)) * 1e3
        print(f"{name:28s}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
