"""CHUNK/INNER sweep for the Pallas z-buffer kernel (isolated marginal).

python tools/profile_pallas_sweep.py [CHUNK INNER]...
e.g. python tools/profile_pallas_sweep.py 512 16 1024 8 512 32
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simultaneous_diffusion_for_pointclouds_tpu.ops import zbuffer_pallas as zp


def main(configs):
    rng = np.random.default_rng(0)
    b, m, row_segs = 8, 524288, 116737
    keys = jnp.asarray(rng.integers(0, row_segs - 1, (b, m)), jnp.int32)
    value = jnp.asarray(rng.uniform(0, 10, (b, m)), jnp.float32)
    payload = jnp.asarray(rng.normal(size=(b, m)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(b, m)) > 0.3)

    def chain(n):
        def f(v0):
            out = 0.0
            v = v0
            for _ in range(n):
                st = zp.zbuffer_stats_sorted_batched_pallas(
                    keys, v, payload, valid, row_segs
                )
                s = sum(getattr(st, f_)[:8].sum() for f_ in st._fields)
                out = out + s
                v = v + s * 1e-12
            return out
        return f

    ref = None
    for chunk, inner in configs:
        zp.CHUNK, zp.INNER, zp._WIN = chunk, inner, chunk + 128
        # distinct jit cache per config (the jit wrapper closes over globals
        # read at trace time; bust the cache via the static interpret arg is
        # not possible, so clear it)
        zp.zbuffer_stats_sorted_batched_pallas._clear_cache()
        f1, f2 = jax.jit(chain(1)), jax.jit(chain(2))

        def t(f):
            jax.block_until_ready(f(value))
            t0 = time.perf_counter()
            for _ in range(3):
                o = f(value)
            jax.block_until_ready(o)
            return (time.perf_counter() - t0) / 3

        ms = (t(f2) - t(f1)) * 1e3
        # sanity: first config is the baseline; others must match numerically
        s = np.asarray(
            zp.zbuffer_stats_sorted_batched_pallas(
                keys, value, payload, valid, row_segs
            ).sum_value
        )
        if ref is None:
            ref = s
        ok = np.allclose(ref, s, rtol=1e-5, atol=1e-5)
        print(f"CHUNK={chunk:5d} INNER={inner:3d}: {ms:7.2f} ms  "
              f"{'ok' if ok else 'MISMATCH'}", flush=True)


if __name__ == "__main__":
    vals = [int(v) for v in sys.argv[1:]]
    cfgs = list(zip(vals[::2], vals[1::2])) or [(512, 16), (1024, 8), (512, 32)]
    main(cfgs)
