"""Does indices_are_sorted make TPU segment_sum cheap? Marginal cost at
E=4.2M -> S=934k, sorted vs unsorted keys, flag on/off."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def marginal(make_chain, args, n1=1, n2=3):
    f1, f2 = jax.jit(make_chain(n1)), jax.jit(make_chain(n2))

    def t(f):
        jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        for _ in range(3):
            o = f(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / 3

    return (t(f2) - t(f1)) / (n2 - n1)


def main():
    E, S = 4 * 1024 * 1024, 933889
    rng = np.random.default_rng(0)
    keys_sorted = jnp.asarray(np.sort(rng.integers(0, S, E)), jnp.int32)
    vals = jnp.asarray(rng.uniform(0, 1, E), jnp.float32)
    r = jnp.asarray(rng.uniform(0, 1, S), jnp.float32)

    def chain(flag, ncols):
        def make(n):
            def f(v):
                acc = jnp.float32(0)
                for i in range(n):
                    outs = [
                        jax.ops.segment_sum(
                            v * (1.0 + 0.0 * acc) + j, keys_sorted, S,
                            indices_are_sorted=flag,
                        )
                        for j in range(ncols)
                    ]
                    acc = acc + sum((o * r).sum() for o in outs)
                return acc
            return f
        return make

    for flag in (True, False):
        ms = marginal(chain(flag, 1), (vals,)) * 1e3
        print(f"segment_sum sorted={flag} x1: {ms:8.2f} ms", flush=True)
    ms = marginal(chain(True, 5), (vals,)) * 1e3
    print(f"segment_sum sorted=True x5: {ms:8.2f} ms", flush=True)

    # segment_min with sorted indices for reference
    def chain_min(flag):
        def make(n):
            def f(v):
                acc = jnp.float32(0)
                for _ in range(n):
                    o = jax.ops.segment_min(
                        v + 0.0 * acc, keys_sorted, S, indices_are_sorted=flag
                    )
                    acc = acc + (o * r).sum()
                return acc
            return f
        return make

    for flag in (True, False):
        ms = marginal(chain_min(flag), (vals,)) * 1e3
        print(f"segment_min sorted={flag} x1: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
