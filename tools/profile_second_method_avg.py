"""Second-method per-id averaging: segment_sum scatters vs sorted-stream.

The sampler's inner step (diffusion/second_method.py) renumbers ids with a
sort, then runs 9 ``segment_sum`` scatters (count + 8 averaged channels)
plus a write-back scatter.  The sorted-stream variant carries the four
pre-added value channels (avg(a)+avg(b) == avg(a+b) over identical
segments) through the SAME sort, computes per-id sums with a segmented
Hillis-Steele scan (segment-local magnitudes -> no f32 cancellation, unlike
a global cumsum), scatters only the int32 segment-end positions once, and
gathers the dense table — 10 scatters become 1.

python tools/profile_second_method_avg.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools._marginal import marginal

B, H, W = 8, 64, 1024
BN = B * H * W
T = BN + 1


def current_avg(flat_ids, v4):
    """Today's pipeline: renumber sort + write-back + 9 segment scatters."""
    sid, spos = jax.lax.sort(
        (flat_ids, jnp.arange(BN, dtype=jnp.int32)), num_keys=1
    )
    first = jnp.concatenate([jnp.ones(1, bool), sid[1:] != sid[:-1]])
    dense_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    ids = jnp.zeros(BN, jnp.int32).at[spos].set(dense_sorted, unique_indices=True)
    ones = jnp.ones(BN, jnp.float32)
    raw_count = jax.ops.segment_sum(ones, ids, T)
    count = raw_count + 1e-12

    def avg(v):
        return jax.ops.segment_sum(v, ids, T) / count

    outs = [avg(v4[i]) + avg(v4[i] * 0.5) for i in range(4)]
    return outs, raw_count > 0


def sorted_stream_avg(flat_ids, v4):
    """Sorted-stream: one 5-operand sort, segmented scans, 1 int32 scatter,
    5 gathers."""
    pre = [v4[i] + v4[i] * 0.5 for i in range(4)]  # pre-added channels
    sid, s0, s1, s2, s3 = jax.lax.sort((flat_ids, *pre), num_keys=1)
    first = jnp.concatenate([jnp.ones(1, bool), sid[1:] != sid[:-1]])
    dense_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
    end = jnp.concatenate([sid[1:] != sid[:-1], jnp.ones(1, bool)])

    # segmented inclusive sums over (1, BN) rows (lane-friendly layout)
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (
        _segmented_scan_2d_multi,
    )

    sums, _ = _segmented_scan_2d_multi(
        [s[None] for s in (s0, s1, s2, s3)],
        [s0[None]],
        first[None],
    )

    # end positions per dense id: ONE unique int32 scatter
    pos = jnp.arange(BN, dtype=jnp.int32)
    ends_pos = (
        jnp.full(T, -1, jnp.int32)
        .at[jnp.where(end, dense_sorted, T - 1)]
        .set(pos, mode="drop", unique_indices=True)
    )
    used = ends_pos >= 0
    gpos = jnp.maximum(ends_pos, 0)
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), ends_pos[:-1]])
    count = jnp.where(used, (ends_pos - prev).astype(jnp.float32), 0.0) + 1e-12

    outs = [jnp.where(used, s[0][gpos], 0.0) / count for s in sums]
    return outs, used


def main():
    rng = np.random.default_rng(0)
    # ~half the pixels share ids (merged points), half fresh: realistic mix
    ids = rng.integers(0, BN // 2, BN).astype(np.int32)
    flat_ids = jnp.asarray(ids)
    v4 = jnp.asarray(rng.normal(size=(4, BN)) * 20, jnp.float32)

    # correctness cross-check first (CPU or TPU)
    ca, cu = jax.jit(current_avg)(flat_ids, v4)
    sa, su = jax.jit(sorted_stream_avg)(flat_ids, v4)
    # current: table indexed by renumbered ids; sorted-stream: same order
    for a, b in zip(ca, sa):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4
        )
    np.testing.assert_array_equal(np.asarray(cu), np.asarray(su))
    print("parity ok", flush=True)

    for name, fn in (("current", current_avg), ("sorted-stream", sorted_stream_avg)):

        def chain(n, fn=fn):
            def f(ids0, v):
                out = jnp.float32(0)
                ids = ids0
                for _ in range(n):
                    outs, used = fn(ids, v)
                    s = sum(o.sum() for o in outs) + used.sum()
                    out = out + s
                    ids = jnp.clip(
                        ids + (s > jnp.inf).astype(jnp.int32), 0, BN - 1
                    )
                return out

            return f

        ms = marginal(chain, (flat_ids, v4)) * 1e3
        print(f"{name:14s}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
