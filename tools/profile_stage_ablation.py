"""Marginal cost of zbuffer_stats_sorted_batched truncated after each stage.

Pinpoints where the composed graph's time goes (isolated-stage sums from
profile_compaction.py do not add up to the composed cost).

python tools/profile_stage_ablation.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simultaneous_diffusion_for_pointclouds_tpu.ops import scatter
from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (
    _BIG,
    _bits_to_float,
    _order_bits,
    _segmented_scan_2d_multi,
)


from _marginal import marginal  # noqa: E402


def truncated(keys, value, payload, valid, row_segments, stage):
    """Replicates zbuffer_stats_sorted_batched up to `stage`, returning a
    small consumable summary so nothing is DCE'd."""
    b, m = keys.shape
    live = row_segments - 1
    k = jnp.where(valid, keys, live).astype(jnp.int32)
    vbits = _order_bits(jnp.where(valid, value, _BIG).astype(jnp.float32))

    sk, s_vbits, sp = jax.lax.sort((k, vbits, payload.astype(jnp.float32)), num_keys=2)
    sk, s_vbits, sp = jax.lax.optimization_barrier((sk, s_vbits, sp))
    sv = (sk != live).astype(jnp.float32)
    d = _bits_to_float(s_vbits) * sv
    sp = sp * sv
    if stage == "sort1":
        return d[:, :8].sum() + sp[:, :8].sum() + sk[:, :8].sum()

    change = sk[:, 1:] != sk[:, :-1]
    start = jnp.concatenate([jnp.ones((b, 1), bool), change], axis=1)
    end = jnp.concatenate([change, jnp.ones((b, 1), bool)], axis=1)
    sums, firsts = _segmented_scan_2d_multi([d, sp, sv], [d, sp], start)
    if stage == "scan":
        return sum(a[:, :8].sum() for a in sums) + sum(f[:, :8].sum() for f in firsts)

    big_key = jnp.int32(jnp.iinfo(jnp.int32).max)
    okey = jnp.where(end & (sk != live), sk, big_key)
    sort2_in = jax.lax.optimization_barrier(
        (okey, sums[0], sums[1], sums[2], firsts[0], firsts[1])
    )
    n = min(row_segments, m)
    co, c0, c1, c2, c3, c4 = jax.lax.sort(sort2_in, num_keys=1)
    if stage == "sort2":
        return sum(c[:, :8].sum() for c in (c0, c1, c2, c3, c4)) + co[:, :8].sum()

    co = co[:, :n]
    num_segments = b * live + 1
    row_off = jnp.arange(b, dtype=jnp.int32)[:, None] * live
    idx = jnp.where(co < live, co + row_off, num_segments).reshape(-1)
    idx, c0, c1, c2, c3, c4 = jax.lax.optimization_barrier((idx, c0, c1, c2, c3, c4))

    def densify(col):
        return jnp.zeros(num_segments, jnp.float32).at[idx].set(
            col[:, :n].reshape(-1), mode="drop", unique_indices=True,
        )

    return sum(densify(c)[:8].sum() for c in (c0, c1, c2, c3, c4))


def main(views=8):
    h, w = 64, 1024
    from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import (
        kitti_sampler_grid,
    )

    big = kitti_sampler_grid(h, w).big_rows
    B = views
    M = views * h * w
    row_segs = big * w + 1
    print(f"B={B} M={M} row_segs={row_segs}", flush=True)

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, row_segs - 1, (B, M)), jnp.int32)
    value = jnp.asarray(rng.uniform(0, 10, (B, M)), jnp.float32)
    payload = jnp.asarray(rng.normal(size=(B, M)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(B, M)) > 0.3)

    def chain(stage):
        def make(nreps):
            def f(v0):
                out = 0.0
                v = v0
                for _ in range(nreps):
                    s = truncated(keys, v, payload, valid, row_segs, stage)
                    out = out + s
                    v = v + s * 1e-12
                return out
            return f
        return make

    stages = sys.argv[2:] if len(sys.argv) > 2 else ("sort1", "scan", "sort2", "full")
    for stage in stages:
        t = marginal(chain(stage), (value,)) * 1e3
        print(f"through {stage:6s}: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
