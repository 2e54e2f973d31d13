"""Marginal-cost breakdown of the cross-view merge on the real TPU.

Usage: python tools/profile_merge.py [views]

Chains N vs M dependent copies of each stage inside one jit (PERF_NOTES.md
protocol) so tunnel latency and result caching cancel out.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simultaneous_diffusion_for_pointclouds_tpu.diffusion.consistency import (
    ConsistencyConfig,
    shared_view_images,
)
from simultaneous_diffusion_for_pointclouds_tpu.ops import scatter
from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import kitti_sampler_grid


def timeit(f, *args, reps=4):
    out = f(*args)
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t) / reps


def marginal(make_chain, args, n1=1, n2=2):
    f1 = jax.jit(make_chain(n1))
    f2 = jax.jit(make_chain(n2))
    t1 = timeit(f1, *args)
    t2 = timeit(f2, *args)
    return (t2 - t1) / (n2 - n1)


def main(views=8):
    h, w = 64, 1024
    grid = kitti_sampler_grid(h, w)
    big = grid.big_rows
    A = views
    B = A
    N = h * w
    E = A * A * N
    S = B * big * w + 1
    print(f"views={A} E={E} big_rows={big} num_segments={S}", flush=True)
    rng = np.random.default_rng(0)

    keys = jnp.asarray(rng.integers(0, S - 1, E), jnp.int32)
    value = jnp.asarray(rng.uniform(0, 1, E), jnp.float32)
    payload = jnp.asarray(rng.uniform(0, 1, E), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=E) > 0.2)

    # ---- full merge for context ----
    cfg = ConsistencyConfig(grid=grid, actual_batch_size=A, setting=5, variant="offsets")
    x = jnp.asarray(rng.uniform(0, 1, (B, 2, h, w)), jnp.float32)
    sky = jnp.ones((B, 1, h, w), jnp.float32)
    exist = jnp.ones((B, h, w), jnp.float32)
    origins = jnp.asarray(rng.uniform(-10, 10, (A, 3)), jnp.float32)

    def merge_chain(n):
        def f(x):
            for _ in range(n):
                ni, mi, th = shared_view_images(x, sky, exist, cfg, 1.0, origins=origins)
                x = x + 1e-6 * ni
            return x
        return f

    print(f"full merge:        {marginal(merge_chain, (x,))*1e3:8.2f} ms", flush=True)

    # ---- stage breakdown on raw scatter inputs ----
    trash = S - 1

    def dep(out_scalar, arr):
        return arr + 0.0 * out_scalar

    def stage_chain(stage):
        def make(n):
            def f(value):
                acc = jnp.float32(0)
                v = value
                for _ in range(n):
                    k = jnp.where(valid, keys, trash).astype(jnp.int32)
                    vbits = scatter._order_bits(jnp.where(valid, v, scatter._BIG))
                    validf = valid.astype(jnp.float32)
                    if stage == "sort1":
                        sk, s_vbits, sp, sv = jax.lax.sort(
                            (k, vbits, payload, validf), num_keys=2)
                        acc += sv[0] + sp[0] + jnp.float32(sk[0]) + jnp.float32(s_vbits[0])
                        v = dep(acc, v)
                        continue
                    sk, s_vbits, sp, sv = jax.lax.sort(
                        (k, vbits, payload, validf), num_keys=2)
                    d = scatter._bits_to_float(s_vbits) * sv
                    spp = sp * sv
                    start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
                    end = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones(1, bool)])
                    sums, firsts = scatter._segmented_scan(
                        jnp.stack([d, spp, sv], axis=1),
                        jnp.stack([d * sv, spp], axis=1), start)
                    if stage == "scan":
                        acc += sums[0, 0] + firsts[0, 0]
                        v = dep(acc, v)
                        continue
                    order = jnp.where(end, 0, 1).astype(jnp.int32)
                    co, csk, c0, c1, c2, c3, c4 = jax.lax.sort(
                        (order, sk, sums[:, 0], sums[:, 1], sums[:, 2],
                         firsts[:, 0], firsts[:, 1]), num_keys=1)
                    if stage == "sort2":
                        acc += c0[0] + c1[0] + c2[0] + c3[0] + c4[0] + jnp.float32(co[0] + csk[0])
                        v = dep(acc, v)
                        continue
                    n_seg = min(S, E)
                    idx = jnp.where(co[:n_seg] == 0, csk[:n_seg], S)

                    def densify(col):
                        return jnp.zeros(S, jnp.float32).at[idx].set(
                            col[:n_seg], mode="drop", unique_indices=True)

                    acc += (densify(c0)[0] + densify(c1)[0] + densify(c2)[0]
                            + densify(c3)[0] + densify(c4)[0])
                    v = dep(acc, v)
                return acc + jnp.sum(v[:8])
            return f
        return make

    for stage in ["sort1", "scan", "sort2", "full"]:
        ms = marginal(stage_chain(stage), (value,)) * 1e3
        print(f"zbuffer {stage:7s}:  {ms:8.2f} ms", flush=True)

    # plain (5 independent segment ops) for reference
    def plain_chain(n):
        def f(v):
            acc = jnp.float32(0)
            for _ in range(n):
                st = scatter.zbuffer_stats(keys, v, payload, valid, S)
                acc += st.sum_value[0] + st.sum_payload[0] + st.count[0] + st.min_value[0] + st.min_payload[0]
                v = dep(acc, v)
            return acc
        return f

    print(f"zbuffer plain:     {marginal(plain_chain, (value,))*1e3:8.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
