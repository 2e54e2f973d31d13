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
