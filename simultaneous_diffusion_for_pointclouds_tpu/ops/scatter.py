"""Z-buffer scatter reductions for cross-view reprojection.

The reference resolves multiple points landing on one pixel with a serialized
per-view loop of ``argsort`` + two stable sorts + ``unique_consecutive`` +
three ``sparse_coo_tensor`` scatters (models/__init__.py:374-509,
KITTISampling.py:260-430).  On TPU we replace the whole loop with batched
segment reductions over flattened (view, row, col) keys — one XLA program,
no data-dependent shapes, all views resolved in parallel:

- **average**: ``segment_sum(depth) / segment_sum(1)`` — identical to the
  reference's coo-sum divided by duplicate count.
- **min**: ``segment_min(depth)``; the winning point's payload (intensity)
  is recovered with a bitwise-order trick on non-negative floats.
- **controlled average** (setting>=7) is then elementwise on these stats.

Semantics note on ties: the reference's min keeps the point that sorts last
in its depth-descending ordering; with bit-equal depths we instead keep the
max-payload winner.  Bit-equal depth ties have measure zero on diffusing
float inputs, so statistical fidelity is preserved.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ZBufferStats(NamedTuple):
    """Per-pixel reduction results, each shaped (num_segments,)."""

    sum_value: jnp.ndarray  # sum of primary values of hits
    sum_payload: jnp.ndarray  # sum of payload values of hits
    count: jnp.ndarray  # number of hits (float)
    min_value: jnp.ndarray  # min primary value (0 where empty)
    min_payload: jnp.ndarray  # payload of the min-value hit (0 where empty)


def _order_bits(x):
    """Bitcast a non-negative float32 to int32 preserving order."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _bits_to_float(b):
    return jax.lax.bitcast_convert_type(b, jnp.float32)


_BIG = jnp.float32(3.0e38)


def zbuffer_stats(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
    num_segments: int,
) -> ZBufferStats:
    """Segment reductions for the z-buffer merge.

    Args:
      keys: int32 (N,) flattened pixel ids; invalid entries may hold anything.
      value: float32 (N,) primary channel (log-depth, always >= 0 here).
      payload: float32 (N,) secondary channel (intensity; any sign).
      valid: bool (N,) in-grid mask.
      num_segments: static segment count; key ``num_segments-1`` should be
        reserved as the trash bin by the caller (invalid entries are routed
        there regardless).

    Returns per-segment stats (see :class:`ZBufferStats`).
    """
    trash = num_segments - 1
    keys = jnp.where(valid, keys, trash).astype(jnp.int32)
    validf = valid.astype(value.dtype)

    sum_value = jax.ops.segment_sum(value * validf, keys, num_segments)
    sum_payload = jax.ops.segment_sum(payload * validf, keys, num_segments)
    count = jax.ops.segment_sum(validf, keys, num_segments)

    masked_value = jnp.where(valid, value, _BIG)
    min_value = jax.ops.segment_min(masked_value, keys, num_segments)
    empty = count == 0
    min_value = jnp.where(empty, 0.0, min_value)

    # Winner payload: a point wins if its value bit-equals the segment min.
    # value >= 0 so the bit pattern is order-preserving; compare in int32 to
    # avoid -0.0/NaN pitfalls.
    seg_min_bits = _order_bits(jnp.where(empty, _BIG, min_value))
    is_winner = valid & (_order_bits(value) == seg_min_bits[keys])
    min_payload = jax.ops.segment_max(
        jnp.where(is_winner, payload, -_BIG), keys, num_segments
    )
    min_payload = jnp.where(empty, 0.0, min_payload)

    return ZBufferStats(sum_value, sum_payload, count, min_value, min_payload)


def _segmented_inclusive_sum(vals: jnp.ndarray, start: jnp.ndarray) -> jnp.ndarray:
    """Segmented inclusive prefix sum (Hillis–Steele) over (E, C) values with
    boundary flags ``start``: log2(E) passes of masked shifted adds — pure
    vector ops, tree-structured accumulation (no catastrophic cancellation).
    """
    e = vals.shape[0]
    flag = start
    shift = 1
    while shift < e:
        prev = jnp.concatenate([jnp.zeros((shift, vals.shape[1]), vals.dtype), vals[:-shift]])
        prev_flag = jnp.concatenate([jnp.ones(shift, bool), flag[:-shift]])
        vals = vals + jnp.where(flag[:, None], 0.0, prev)
        flag = flag | prev_flag
        shift *= 2
    return vals


def zbuffer_stats_sorted(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
    num_segments: int,
) -> ZBufferStats:
    """Sort-based z-buffer reductions — same results as
    :func:`zbuffer_stats`, one explicit (key, value)-sort instead of five
    independent scatter ops (XLA lowers each TPU scatter through its own
    sort, so sharing one sort is ~2x cheaper end-to-end; measured in
    bench.py's profile notes).

    After sorting by (key, value-bits): the first element of every segment
    is the min (and carries its payload); segment sums come from a segmented
    scan read off at segment ends; dense images are built with two
    unique-index scatters (ends and starts).
    """
    trash = num_segments - 1
    k = jnp.where(valid, keys, trash).astype(jnp.int32)
    vbits = _order_bits(jnp.where(valid, value, _BIG).astype(jnp.float32))
    validf = valid.astype(jnp.float32)
    sk, s_vbits, sp, sv = jax.lax.sort(
        (k, vbits, payload.astype(jnp.float32), validf), num_keys=2
    )
    d = _bits_to_float(s_vbits) * sv  # invalid entries (trash segment) -> 0
    sp = sp * sv

    start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    end = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones(1, bool)])

    scanned = _segmented_inclusive_sum(jnp.stack([d, sp, sv], axis=1), start)

    zeros = jnp.zeros((num_segments, 3), jnp.float32)
    idx_end = jnp.where(end, sk, num_segments)
    sums = zeros.at[idx_end].set(scanned, mode="drop", unique_indices=True)
    sum_value, sum_payload, count = sums[:, 0], sums[:, 1], sums[:, 2]

    idx_start = jnp.where(start & (sv > 0), sk, num_segments)
    mins = jnp.zeros((num_segments, 2), jnp.float32).at[idx_start].set(
        jnp.stack([d, sp], axis=1), mode="drop", unique_indices=True
    )
    return ZBufferStats(sum_value, sum_payload, count, mins[:, 0], mins[:, 1])
