"""CHUNK/INNER sweep for the flat-layout z-buffer kernel.

The (512, 16) tuning predates the flat one-K-contraction layout; with a
single (16, CHUNK) @ (CHUNK, CHUNK+128) dot per chunk, larger CHUNK
amortizes MXU pipeline fills further (at the cost of a wider one-hot
build).  Measures the FULL pipeline (sort + prep + kernel) marginally per
config, monkeypatching the module constants and re-jitting fresh (the
public entry point's jit cache would not see the new globals).

python tools/profile_kernel_chunk.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools._marginal import marginal  # noqa: E402
from simultaneous_diffusion_for_pointclouds_tpu.ops import (  # noqa: E402
    zbuffer_pallas as zp,
)


def main():
    rng = np.random.default_rng(0)
    b, m, row_segs = 8, 524288, 116737
    live = row_segs - 1
    keys = jnp.asarray(rng.integers(0, live, (b, m)), jnp.int32)
    value = jnp.asarray(rng.uniform(0, 10, (b, m)), jnp.float32)
    payload = jnp.asarray(rng.normal(size=(b, m)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(b, m)) > 0.3)

    def full(v):
        sk, d, w, sm, (spw,) = zp._sort_with_sentinels(
            keys, v, [payload], valid, live
        )
        out = zp._run_zbuffer_kernel(
            sk, [d * w, spw, w, d * sm, spw * sm], b, m + live, live, False
        )
        return out[:, :5, :8].sum()

    def chain(n):
        def f(v0):
            acc = 0.0
            v = v0
            for _ in range(n):
                s = full(v)
                acc = acc + s
                v = v + s * 1e-12
            return acc

        return f

    base = None
    for chunk, inner in [(512, 16), (1024, 8), (1024, 16), (768, 16), (256, 32), (512, 32)]:
        zp.CHUNK, zp.INNER, zp._WIN = chunk, inner, chunk + 128
        try:
            ms = marginal(chain, (value,)) * 1e3
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"CHUNK={chunk:5d} INNER={inner:3d}: FAILED {type(e).__name__}: {e}"[:200], flush=True)
            continue
        if base is None:
            base = ms
        print(f"CHUNK={chunk:5d} INNER={inner:3d}: {ms:7.2f} ms  ({ms - base:+.2f})", flush=True)


if __name__ == "__main__":
    main()
