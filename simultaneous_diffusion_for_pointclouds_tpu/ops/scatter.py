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


def _segmented_scan(add_vals: jnp.ndarray, first_vals: jnp.ndarray, start: jnp.ndarray):
    """Segmented inclusive scans (Hillis–Steele, log2(E) masked-shift
    passes): ``add_vals`` (E, Ca) accumulate within segments (tree-ordered
    sums — no catastrophic cancellation); ``first_vals`` (E, Cf) propagate
    each segment's FIRST element forward."""
    e = add_vals.shape[0]
    flag = start
    shift = 1
    while shift < e:
        pad_a = jnp.zeros((shift, add_vals.shape[1]), add_vals.dtype)
        prev_a = jnp.concatenate([pad_a, add_vals[:-shift]])
        pad_f = jnp.zeros((shift, first_vals.shape[1]), first_vals.dtype)
        prev_f = jnp.concatenate([pad_f, first_vals[:-shift]])
        prev_flag = jnp.concatenate([jnp.ones(shift, bool), flag[:-shift]])
        keep = flag[:, None]
        add_vals = add_vals + jnp.where(keep, 0.0, prev_a)
        first_vals = jnp.where(keep, first_vals, prev_f)
        flag = flag | prev_flag
        shift *= 2
    return add_vals, first_vals


def zbuffer_stats_sorted_v3(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
    num_segments: int,
) -> ZBufferStats:
    """Leaner sort-based z-buffer (same results as :func:`zbuffer_stats`).

    PROFILING-ONLY: not dispatchable via ``ConsistencyConfig.merge_impl``;
    kept as a documented experiment for tools/profile_merge.py and the
    equivalence sweep (superseded by the batched pipelines + the Pallas
    kernel).

    On-TPU profile of :func:`zbuffer_stats_sorted` at the flagship shape
    (E=4.2M, tools/profile_merge.py): sort1 15 ms, scans 6.6 ms, sort2
    24 ms — the 7-operand compaction sort dominates because variadic sort
    cost scales with operand count.  v3 restructures so each sort carries
    the minimum:

    1. sort1 by key ONLY (1 key, 3 operands): the segment *min* no longer
       needs depth bits in the sort key — it is recovered by a lexicographic
       (value-bits, payload-bits) segmented min-scan, which rides the same
       Hillis-Steele passes as the sums.
    2. the count needs no scanned column at all: with segment-END rows
       compacted in key order, segment r starts right after segment r-1
       ends, so ``count = end_pos - prev_end_pos``.
    3. sort2 carries (packed end-flag+key, position) — 2 operands instead
       of 7; the four scanned stats are gathered at the compacted end
       positions afterwards (monotone indices -> cheap gather).

    Tie-break note: bit-equal values resolve to the smaller payload bit
    pattern (measure-zero on diffusing floats, same caveat as v2).
    """
    e = keys.shape[0]
    trash = num_segments - 1
    k = jnp.where(valid, keys, trash).astype(jnp.int32)

    sk, sv, sp = jax.lax.sort(
        (k, value.astype(jnp.float32), payload.astype(jnp.float32)), num_keys=1
    )
    s_valid = sk != trash  # only invalid entries are routed to the trash bin
    d = jnp.where(s_valid, sv, 0.0)
    p = jnp.where(s_valid, sp, 0.0)
    # value >= 0 (log depth) so its bit pattern is order-preserving
    d_bits = _order_bits(jnp.where(s_valid, sv, _BIG))
    p_bits = _order_bits(sp)

    start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    end = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones(1, bool)])

    # fused segmented scans: sums accumulate, (d_bits, p_bits) lexicographic
    # min propagates to the segment end
    add_vals = jnp.stack([d, p], axis=1)
    min_vals = jnp.stack([d_bits, p_bits], axis=1)
    flag = start
    shift = 1
    while shift < e:
        pad_a = jnp.zeros((shift, 2), add_vals.dtype)
        prev_a = jnp.concatenate([pad_a, add_vals[:-shift]])
        pad_m = jnp.full((shift, 2), jnp.iinfo(jnp.int32).max, min_vals.dtype)
        prev_m = jnp.concatenate([pad_m, min_vals[:-shift]])
        prev_flag = jnp.concatenate([jnp.ones(shift, bool), flag[:-shift]])
        keep = flag[:, None]
        add_vals = add_vals + jnp.where(keep, 0.0, prev_a)
        prev_smaller = (prev_m[:, 0] < min_vals[:, 0]) | (
            (prev_m[:, 0] == min_vals[:, 0]) & (prev_m[:, 1] < min_vals[:, 1])
        )
        min_vals = jnp.where(
            keep | ~prev_smaller[:, None], min_vals, prev_m
        )
        flag = flag | prev_flag
        shift *= 2
    sums, mins = add_vals, min_vals

    # compact END rows to the front: 2-operand sort by (end?key:BIG)
    okey = jnp.where(end, sk, jnp.iinfo(jnp.int32).max)
    pos = jnp.arange(e, dtype=jnp.int32)
    cokey, cpos = jax.lax.sort((okey, pos), num_keys=1)

    n = min(num_segments, e)
    cokey, cpos = cokey[:n], cpos[:n]
    present = cokey < num_segments  # real end rows only
    # segment r spans (prev end, this end]; ends are in increasing key AND
    # position order, and the sorted array is fully partitioned by segments
    prev_end = jnp.concatenate([jnp.full(1, -1, jnp.int32), cpos[:-1]])
    cnt = (cpos - prev_end).astype(jnp.float32)

    sum_value = sums[cpos, 0]
    sum_payload = sums[cpos, 1]
    min_value = _bits_to_float(mins[cpos, 0])
    min_payload = _bits_to_float(mins[cpos, 1])

    idx = jnp.where(present, cokey, num_segments)

    def densify(col):
        return jnp.zeros(num_segments, jnp.float32).at[idx].set(
            col, mode="drop", unique_indices=True
        )

    return ZBufferStats(
        densify(sum_value),
        densify(sum_payload),
        densify(cnt),
        densify(min_value),
        densify(min_payload),
    )


def _segmented_scan_2d(add_vals, first_vals, start):
    """Row-batched segmented inclusive scans along axis 1.

    ``add_vals`` (B, M, Ca) accumulate within segments; ``first_vals``
    (B, M, Cf) propagate each segment's first element; ``start`` (B, M)."""
    m = add_vals.shape[1]
    flag = start
    shift = 1
    while shift < m:
        pad_a = jnp.zeros_like(add_vals[:, :shift])
        prev_a = jnp.concatenate([pad_a, add_vals[:, :-shift]], axis=1)
        pad_f = jnp.zeros_like(first_vals[:, :shift])
        prev_f = jnp.concatenate([pad_f, first_vals[:, :-shift]], axis=1)
        prev_flag = jnp.concatenate(
            [jnp.ones_like(flag[:, :shift]), flag[:, :-shift]], axis=1
        )
        keep = flag[..., None]
        add_vals = add_vals + jnp.where(keep, 0.0, prev_a)
        first_vals = jnp.where(keep, first_vals, prev_f)
        flag = flag | prev_flag
        shift *= 2
    return add_vals, first_vals


def _segmented_scan_2d_multi(add_vals, first_vals, start):
    """Row-batched segmented inclusive scans over SEPARATE (B, M) arrays.

    Identical math to :func:`_segmented_scan_2d` on channel-stacked inputs,
    but each channel stays a full (B, M) array: a (B, M, C) stack puts C in
    the 128-lane minor dimension, wasting 128/C of every vector op.

    Deliberately Hillis–Steele (full-width masked-shift passes), NOT
    ``lax.associative_scan``: the Blelloch recursion's stride-2 interleaved
    slices force lane relayouts on TPU and a (8, 524288) 6-tuple scan never
    finished compiling/running in 9+ minutes, while these shift passes are
    plain contiguous vector ops.
    """
    m = add_vals[0].shape[1]
    flag = start
    shift = 1
    while shift < m:
        prev_flag = jnp.concatenate(
            [jnp.ones_like(flag[:, :shift]), flag[:, :-shift]], axis=1
        )
        keep = flag

        def shifted(x):
            pad = jnp.zeros_like(x[:, :shift])
            return jnp.concatenate([pad, x[:, :-shift]], axis=1)

        add_vals = [a + jnp.where(keep, 0.0, shifted(a)) for a in add_vals]
        first_vals = [jnp.where(keep, f, shifted(f)) for f in first_vals]
        flag = flag | prev_flag
        shift *= 2
    return add_vals, first_vals


def zbuffer_stats_sorted_batched(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
    row_segments: int,
) -> ZBufferStats:
    """Row-batched sorted z-buffer: same results as flattening each row of
    ``keys + r * row_segments`` through :func:`zbuffer_stats`, but every sort
    runs per row along the last axis — log2(M) instead of log2(B*M) bitonic
    depth — and sort1 drops the validity operand (recomputed from the trash
    key after sorting).

    Stage structure (sort1 | scans | sort2 | scatters) is pinned with
    ``optimization_barrier``: without it XLA fuses the scan chain into each
    compaction-sort operand and the composed cost was ~2.5x the sum of the
    stages (tools/profile_compaction.py).

    Args:
      keys: int32 (B, M) row-LOCAL segment ids in [0, row_segments-1);
        ``row_segments - 1`` is the per-row trash bin.
      value/payload/valid: (B, M).
      row_segments: static per-row segment count (incl. trash).

    Returns flat ZBufferStats over ``B * (row_segments - 1) + 1`` segments:
    live segment ``r * (row_segments-1) + k``; one shared trailing trash row.
    """
    b, m = keys.shape
    live = row_segments - 1
    k = jnp.where(valid, keys, live).astype(jnp.int32)
    vbits = _order_bits(jnp.where(valid, value, _BIG).astype(jnp.float32))

    sk, s_vbits, sp = jax.lax.sort((k, vbits, payload.astype(jnp.float32)), num_keys=2)
    sk, s_vbits, sp = jax.lax.optimization_barrier((sk, s_vbits, sp))
    sv = (sk != live).astype(jnp.float32)
    d = _bits_to_float(s_vbits) * sv
    sp = sp * sv

    change = sk[:, 1:] != sk[:, :-1]
    start = jnp.concatenate([jnp.ones((b, 1), bool), change], axis=1)
    end = jnp.concatenate([change, jnp.ones((b, 1), bool)], axis=1)

    sums, firsts = _segmented_scan_2d_multi([d, sp, sv], [d, sp], start)

    # compaction sort: end flag packed into the key (6 operands, 1 key)
    big_key = jnp.int32(jnp.iinfo(jnp.int32).max)
    okey = jnp.where(end & (sk != live), sk, big_key)
    sort2_in = jax.lax.optimization_barrier(
        (okey, sums[0], sums[1], sums[2], firsts[0], firsts[1])
    )
    n = min(row_segments, m)
    co, c0, c1, c2, c3, c4 = jax.lax.sort(sort2_in, num_keys=1)
    co = co[:, :n]
    num_segments = b * live + 1
    row_off = jnp.arange(b, dtype=jnp.int32)[:, None] * live
    idx = jnp.where(co < live, co + row_off, num_segments).reshape(-1)
    idx, c0, c1, c2, c3, c4 = jax.lax.optimization_barrier(
        (idx, c0, c1, c2, c3, c4)
    )

    def densify(col):
        # per-row trash entries map to the max sentinel, so the flattened
        # index vector is NOT globally sorted — no indices_are_sorted hint
        # (and the profiler showed it buys <0.2 ms anyway)
        return jnp.zeros(num_segments, jnp.float32).at[idx].set(
            col[:, :n].reshape(-1), mode="drop", unique_indices=True,
        )

    return ZBufferStats(
        densify(c0), densify(c1), densify(c2), densify(c3), densify(c4)
    )


def zbuffer_stats_sorted_batched_dense(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
    row_segments: int,
) -> ZBufferStats:
    """:func:`zbuffer_stats_sorted_batched` with the five densify scatters
    replaced by a reshape.

    One synthetic sentinel entry is appended per live segment key before
    sort1, with depth ``+inf`` so it sorts to its segment's END (sort1 is
    2-key on (key, depth-bits)) and contributes nothing (weight 0, payload
    0).  Every key then has exactly one segment-end entry — the sentinel,
    carrying the segment's scanned sums and firsts — so the compaction
    sort's first ``live`` outputs per row are the per-key stats in key
    order and densification is a pure reshape.  The stage ablation
    (tools/profile_stage_ablation.py) showed the five "small" scatters cost
    ~26 ms composed (vs ~5 ms isolated); this trades them for ~22% more
    sort/scan width.
    """
    b, m = keys.shape
    live = row_segments - 1
    k = jnp.where(valid, keys, live).astype(jnp.int32)
    vb = jnp.where(valid, value, _BIG).astype(jnp.float32)

    syn_k = jnp.broadcast_to(jnp.arange(live, dtype=jnp.int32)[None], (b, live))
    k = jnp.concatenate([k, syn_k], axis=1)
    vb = jnp.concatenate([vb, jnp.full((b, live), jnp.inf, jnp.float32)], axis=1)
    pay = jnp.concatenate(
        [payload.astype(jnp.float32), jnp.zeros((b, live), jnp.float32)], axis=1
    )

    sk, s_vbits, sp = jax.lax.sort((k, _order_bits(vb), pay), num_keys=2)
    sk, s_vbits, sp = jax.lax.optimization_barrier((sk, s_vbits, sp))
    raw = _bits_to_float(s_vbits)
    is_hit = (sk != live) & jnp.isfinite(raw)  # not trash, not sentinel
    sv = is_hit.astype(jnp.float32)
    d = jnp.where(is_hit, raw, 0.0)
    sp = sp * sv

    change = sk[:, 1:] != sk[:, :-1]
    start = jnp.concatenate([jnp.ones((b, 1), bool), change], axis=1)
    end = jnp.concatenate([change, jnp.ones((b, 1), bool)], axis=1)

    sums, firsts = _segmented_scan_2d_multi([d, sp, sv], [d, sp], start)

    big_key = jnp.int32(jnp.iinfo(jnp.int32).max)
    okey = jnp.where(end & (sk != live), sk, big_key)
    sort2_in = jax.lax.optimization_barrier(
        (okey, sums[0], sums[1], sums[2], firsts[0], firsts[1])
    )
    _, c0, c1, c2, c3, c4 = jax.lax.sort(sort2_in, num_keys=1)

    pad = jnp.zeros(1, jnp.float32)  # shared trailing trash segment

    def densify(col):
        return jnp.concatenate([col[:, :live].reshape(b * live), pad])

    return ZBufferStats(
        densify(c0), densify(c1), densify(c2), densify(c3), densify(c4)
    )


def zbuffer_stats_sorted_batched_gather(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
    row_segments: int,
) -> ZBufferStats:
    """:func:`zbuffer_stats_sorted_batched` with the compaction sort replaced
    by a vectorized binary search: every live pixel id is a query into the
    row-sorted keys (``pos[k]`` = last index with ``sk <= k``), and the five
    scanned stats are gathered at those positions — log2(M) index-gather
    rounds + 6 value gathers instead of a 6-operand bitonic sort + 5
    scatters.  Same results (densify scatters become pure gathers, so empty
    segments are exactly 0 the same way)."""
    b, m = keys.shape
    live = row_segments - 1
    k = jnp.where(valid, keys, live).astype(jnp.int32)
    vbits = _order_bits(jnp.where(valid, value, _BIG).astype(jnp.float32))

    sk, s_vbits, sp = jax.lax.sort((k, vbits, payload.astype(jnp.float32)), num_keys=2)
    sv = (sk != live).astype(jnp.float32)
    d = _bits_to_float(s_vbits) * sv
    sp = sp * sv

    change = sk[:, 1:] != sk[:, :-1]
    start = jnp.concatenate([jnp.ones((b, 1), bool), change], axis=1)

    sums, firsts = _segmented_scan_2d(
        jnp.stack([d, sp, sv], axis=-1),
        jnp.stack([d, sp], axis=-1),
        start,
    )

    # binary search, all live pixel ids as queries: pos = searchsorted_right-1
    q = jax.lax.broadcasted_iota(jnp.int32, (b, live), 1)
    lo = jnp.zeros((b, live), jnp.int32)
    hi = jnp.full((b, live), m, jnp.int32)
    # m.bit_length() rounds halve the search space [0, m] to a point;
    # (m-1).bit_length() is one round short exactly when m is a power of
    # two — the flagship M = 2^19 (regression-tested at m=512)
    rounds = m.bit_length()
    for _ in range(rounds):
        mid = (lo + hi) >> 1
        skm = jnp.take_along_axis(sk, jnp.clip(mid, 0, m - 1), axis=1)
        go_right = skm <= q
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    pos = lo - 1  # last index with sk <= q; -1 when the segment is empty
    cpos = jnp.clip(pos, 0, m - 1)
    found = (pos >= 0) & (jnp.take_along_axis(sk, cpos, axis=1) == q)
    foundf = found.astype(jnp.float32)

    def img(col):
        return (jnp.take_along_axis(col, cpos, axis=1) * foundf).reshape(-1)

    num_segments = b * live + 1
    pad = jnp.zeros(1, jnp.float32)

    def out(col):
        return jnp.concatenate([img(col), pad])

    return ZBufferStats(
        out(sums[..., 0]),
        out(sums[..., 1]),
        out(sums[..., 2]),
        out(firsts[..., 0]),
        out(firsts[..., 1]),
    )


class ZBufferMin2(NamedTuple):
    """Min-depth winner per segment with two payload channels."""

    min_value: jnp.ndarray
    min_payload1: jnp.ndarray
    min_payload2: jnp.ndarray


def zbuffer_min2(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload1: jnp.ndarray,
    payload2: jnp.ndarray,
    valid: jnp.ndarray,
    num_segments: int,
) -> ZBufferMin2:
    """Min-only z-buffer with TWO payloads in one pass.

    The second-method sampler needs, per pixel, the min-depth point's depth,
    intensity AND id (reference models/__init__.py:869-1067).  Round 1 ran
    ``zbuffer_stats`` twice (intensity then id payload) — ~4 scatter-class
    ops.  Here: one (key, value-bits) sort carrying both payloads — the
    segment's FIRST row after the sort IS the winner, so no scans are needed
    at all — then a 2-operand compaction sort and three small gathers +
    scatters.  Exact; empty segments are 0.  Callers must not key valid
    entries to ``num_segments - 1`` (the trash bin).
    """
    e = keys.shape[0]
    trash = num_segments - 1
    k = jnp.where(valid, keys, trash).astype(jnp.int32)
    vbits = _order_bits(jnp.where(valid, value, _BIG).astype(jnp.float32))
    sk, s_vbits, sp1, sp2 = jax.lax.sort(
        (k, vbits, payload1.astype(jnp.float32), payload2.astype(jnp.float32)),
        num_keys=2,
    )
    start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])

    big_key = jnp.int32(jnp.iinfo(jnp.int32).max)
    okey = jnp.where(start & (sk != trash), sk, big_key)
    pos = jnp.arange(e, dtype=jnp.int32)
    cokey, cpos = jax.lax.sort((okey, pos), num_keys=1)
    n = min(num_segments, e)
    cokey, cpos = cokey[:n], cpos[:n]
    idx = jnp.where(cokey < num_segments, cokey, num_segments)

    def densify(col):
        return jnp.zeros(num_segments, jnp.float32).at[idx].set(
            col[cpos], mode="drop", unique_indices=True
        )

    return ZBufferMin2(
        densify(_bits_to_float(s_vbits)), densify(sp1), densify(sp2)
    )


def zbuffer_stats_sorted_v4(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
    num_segments: int,
) -> ZBufferStats:
    """PROFILING-ONLY (see :func:`zbuffer_stats_sorted_v3` — same status):
    v2 structure with the two profiled hotspots fixed
    (tools/profile_merge.py: sort1 15 ms / scans 6.6 ms / sort2 24 ms of a
    49 ms merge at E=4.2M):

    - sort1 drops the ``validf`` operand (4 -> 3): validity is recomputed
      after the sort as ``sorted_key != trash`` since only invalid entries
      are routed to the trash bin (callers must not key valid entries to
      ``num_segments - 1`` — consistency.py guarantees this).
    - the compaction sort carries (packed end-flag key, position) — 2
      operands instead of 7 — and the five scanned stats are gathered at
      the compacted end positions (monotone indices).

    Results are identical to :func:`zbuffer_stats` on live segments.
    """
    e = keys.shape[0]
    trash = num_segments - 1
    k = jnp.where(valid, keys, trash).astype(jnp.int32)
    vbits = _order_bits(jnp.where(valid, value, _BIG).astype(jnp.float32))

    sk, s_vbits, sp = jax.lax.sort((k, vbits, payload.astype(jnp.float32)), num_keys=2)
    sv = (sk != trash).astype(jnp.float32)
    d = _bits_to_float(s_vbits) * sv
    sp = sp * sv

    start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    end = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones(1, bool)])

    sums, firsts = _segmented_scan(
        jnp.stack([d, sp, sv], axis=1),
        jnp.stack([d, sp], axis=1),  # segment-first = min, thanks to the sort
        start,
    )

    # compact END rows to the front with a 2-operand sort, then gather
    big_key = jnp.int32(jnp.iinfo(jnp.int32).max)
    okey = jnp.where(end, sk, big_key)
    pos = jnp.arange(e, dtype=jnp.int32)
    cokey, cpos = jax.lax.sort((okey, pos), num_keys=1)
    n = min(num_segments, e)
    cokey, cpos = cokey[:n], cpos[:n]

    idx = jnp.where(cokey < num_segments, cokey, num_segments)

    def densify(col):
        return jnp.zeros(num_segments, jnp.float32).at[idx].set(
            col[cpos], mode="drop", unique_indices=True
        )

    return ZBufferStats(
        densify(sums[:, 0]),
        densify(sums[:, 1]),
        densify(sums[:, 2]),
        densify(firsts[:, 0]),
        densify(firsts[:, 1]),
    )


def zbuffer_stats_sorted(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
    num_segments: int,
) -> ZBufferStats:
    """Sort-based z-buffer reductions — identical results to
    :func:`zbuffer_stats` at roughly half the cost on TPU (see
    PERF_NOTES.md): every TPU scatter pays an internal sort, so the five
    independent segment ops are replaced by

    1. ONE (key, value-bits) sort carrying (payload, valid)  [~12 ms @4.2M]
    2. segmented Hillis–Steele scans: sums accumulate, the segment-first
       (= min, thanks to the sort) values propagate to the segment end
       [~free: pure vector passes]
    3. a second 1-key sort that compacts segment-END rows to the front so
       the dense images are built with five SMALL (num_segments-sized)
       unique-index 1-column scatters (multi-column TPU scatters cost ~5x
       per column; large ones scale with E).
    """
    e = keys.shape[0]
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

    sums, firsts = _segmented_scan(
        jnp.stack([d, sp, sv], axis=1),
        jnp.stack([d * sv, sp], axis=1),  # min invalid-only segments -> 0
        start,
    )

    # compact END rows (<= num_segments of them) to the front
    order = jnp.where(end, 0, 1).astype(jnp.int32)
    co, csk, c0, c1, c2, c3, c4 = jax.lax.sort(
        (order, sk, sums[:, 0], sums[:, 1], sums[:, 2], firsts[:, 0], firsts[:, 1]),
        num_keys=1,
    )
    n = min(num_segments, e)
    # rows beyond the end-count carry order=1; their keys are routed OOB
    idx = jnp.where(co[:n] == 0, csk[:n], num_segments)

    def densify(col):
        return jnp.zeros(num_segments, jnp.float32).at[idx].set(
            col[:n], mode="drop", unique_indices=True
        )

    return ZBufferStats(
        densify(c0), densify(c1), densify(c2), densify(c3), densify(c4)
    )
