"""Pallas TPU kernel for the post-sort z-buffer reduction.

Replaces the segmented-scan + compaction-sort + scatter pipeline of
``zbuffer_stats_sorted_batched`` (scatter.py) with one kernel that streams
the row-sorted point list and accumulates per-pixel statistics with one-hot
MXU matmuls into a VMEM-resident dense output image.

Why this is possible: the dense-sentinel trick (see
``zbuffer_stats_sorted_batched_dense``) appends one +inf-depth entry per
live pixel key, so in the sorted stream EVERY key in a chunk's key range is
present.  A chunk of C sorted elements therefore spans at most C distinct
keys — a contiguous output window of < C+128 pixels once the window base is
aligned down to a multiple of 128.  Per chunk the kernel builds the
transposed one-hot ``oh[j, i] = (key[i] == base + j)`` and contracts the
statistic rows against it on the MXU, accumulating into the window slice of
the output: sums add across chunks, and the "first" (min-depth) channels
are nonzero for exactly one element per key globally, so += is exact.

Precision: a single bf16 MXU pass would round the f32 statistics to 8
mantissa bits.  Instead each of the five channels is split outside the
kernel into three bf16 parts (hi, mid, lo — 24 mantissa bits total, exact
for f32) and the 15 parts ride one (16, K) bf16 LHS, so ONE single-pass
bf16 matmul per chunk row carries full f32 precision; the kernel re-adds
the three part-rows per channel in f32.  The one-hot RHS is exact in bf16
(0.0/1.0).

Per-chunk window bases are precomputed on the XLA side from the sorted
keys and handed to the kernel through scalar prefetch (SMEM), avoiding
per-chunk VMEM scalar extracts.

Cost at the 8-view flagship shape (B=8, M'≈647k, C=512): ~5k chunks of
4 x (16,128)@(128,640) bf16 matmuls ≈ 3-4 ms of MXU plus the bf16 one-hot
builds — versus ~25 ms of XLA scan + 6-operand bitonic sort + scatters.
Reference behaviour replaced: the per-view z-buffer loop at
models/KITTISampling.py:260-430.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scatter import ZBufferMin2, ZBufferStats, _BIG, _bits_to_float, _order_bits

# chunk of sorted elements processed per inner iteration; the output window
# is CHUNK+128 wide and 128-aligned
CHUNK = 512
# chunks per grid step (amortizes grid overhead; block = INNER*CHUNK elems)
INNER = 16
_WIN = CHUNK + 128


def _zbuffer_kernel(base_ref, sk_ref, st_ref, out_ref):
    """Flat layout: ONE (16, CHUNK) @ (CHUNK, _WIN) bf16 MXU contraction per
    chunk.  The original layout ran CHUNK//128 separate 128-deep dots per
    chunk; fusing them into a single K=CHUNK contraction quarters the MXU
    pipeline fills (measured 18 -> ~10 ms at the flagship shape)."""
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    r0 = pl.program_id(0)
    nchunks = pl.num_programs(1) * INNER
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, _WIN), 1)

    def chunk(i, _):
        # NOTE: predicating this body on "chunk is all-trash" (@pl.when on
        # the first key) measured 20x SLOWER — the conditional around the
        # dynamic out_ref read-modify-write breaks Mosaic's pipelining.
        # Keep the body unconditional.
        first_key = base_ref[r0 * nchunks + g * INNER + i]
        base = pl.multiple_of((first_key >> 7) << 7, 128)
        local = sk_ref[0, i].reshape(CHUNK, 1) - base  # (CHUNK, 1) int32
        stats = st_ref[0, i]  # (16, CHUNK) bf16 — exact bf16 tiles
        oh = (j_ids == local).astype(jnp.bfloat16)  # (CHUNK, _WIN)
        win = jax.lax.dot_general(
            stats, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (16, _WIN)
        final = jnp.concatenate(
            [
                win[0:5] + win[5:10] + win[10:15],
                jnp.zeros((3, _WIN), jnp.float32),
            ],
            axis=0,
        )  # (8, _WIN)
        osl = (0, slice(None), pl.ds(base, _WIN))
        out_ref[osl] = out_ref[osl] + final
        return 0

    jax.lax.fori_loop(0, INNER, chunk, 0)


def _split3(x):
    """Split f32 into three bf16 parts summing exactly to x (24 mantissa
    bits = 3 x 8).  Uses explicit mantissa masking, NOT convert round-trips:
    this environment compiles with ``--xla_allow_excess_precision=true``,
    under which XLA folds ``x - f32(bf16(x))`` to zero and silently degrades
    the split to a single bf16 rounding."""
    mask = jnp.int32(-65536)  # keep sign+exponent+top-7 mantissa bits

    def trunc(v):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(v, jnp.int32) & mask, jnp.float32
        )

    hi = trunc(x)
    r1 = x - hi
    mid = trunc(r1)
    lo = r1 - mid
    return (
        hi.astype(jnp.bfloat16),
        mid.astype(jnp.bfloat16),
        lo.astype(jnp.bfloat16),
    )


# Payload routing through the 2-key sort: "carry" threads every payload
# operand through the bitonic network; "iota" sorts (key, depth-bits, iota)
# and gathers the payloads afterwards with ONE take_along_axis per payload —
# fewer sort operands at the cost of a post-sort gather.  Perf-neutral
# semantics; the faster mode on TPU is selected by measurement
# (PERF_NOTES round-4 sort levers).
SORT_PAYLOAD_MODE = "carry"

# jax.lax.sort defaults to a STABLE sort; the z-buffer only needs the
# (key, depth-bits) order, and ties in that 64-bit composite are either
# all-identical payloads (sentinels/trash, masked out downstream) or
# equal-depth duplicate points where any winner is a valid z-buffer
# result (the reference's CUDA scatter also breaks such ties by schedule).
# False lets XLA drop the stability passes; flipped by measurement
# (tools/profile_sort_modes.py, PERF_NOTES round-4 sort levers).
SORT_STABLE = True


def _sort_with_sentinels(keys, value, payloads, valid, live):
    """Append one +inf sentinel per live key (sorts to its segment's end)
    and 2-key-sort by (key, depth-bits) carrying the payloads.  Returns
    (sk, d, w, sm, sorted_payloads): d = depth zeroed on non-hits, w = hit
    weight, sm = segment-start weight (exactly one per non-empty key)."""
    b, m = keys.shape
    k = jnp.where(valid, keys, live).astype(jnp.int32)
    vb = jnp.where(valid, value, _BIG).astype(jnp.float32)

    syn_k = jnp.broadcast_to(jnp.arange(live, dtype=jnp.int32)[None], (b, live))
    k = jnp.concatenate([k, syn_k], axis=1)
    vb = jnp.concatenate([vb, jnp.full((b, live), jnp.inf, jnp.float32)], axis=1)
    pays = [
        jnp.concatenate(
            [p.astype(jnp.float32), jnp.zeros((b, live), jnp.float32)], axis=1
        )
        for p in payloads
    ]

    if SORT_PAYLOAD_MODE == "iota" and pays:
        iota = jnp.broadcast_to(
            jnp.arange(m + live, dtype=jnp.int32)[None], (b, m + live)
        )
        sk, s_vbits, perm = jax.lax.sort(
            (k, _order_bits(vb), iota), num_keys=2, is_stable=SORT_STABLE
        )
        sps = [jnp.take_along_axis(p, perm, axis=1) for p in pays]
        sk, s_vbits, *sps = jax.lax.optimization_barrier((sk, s_vbits, *sps))
    else:
        sorted_ops = jax.lax.sort(
            (k, _order_bits(vb), *pays), num_keys=2, is_stable=SORT_STABLE
        )
        sorted_ops = jax.lax.optimization_barrier(sorted_ops)
        sk, s_vbits, *sps = sorted_ops
    raw = _bits_to_float(s_vbits)
    is_hit = (sk != live) & jnp.isfinite(raw)
    w = is_hit.astype(jnp.float32)
    d = jnp.where(is_hit, raw, 0.0)
    start = jnp.concatenate(
        [jnp.ones((b, 1), bool), sk[:, 1:] != sk[:, :-1]], axis=1
    )
    sm = start.astype(jnp.float32) * w
    return sk, d, w, sm, [sp * w for sp in sps]


def _run_zbuffer_kernel(sk, chans, b, total, live, interpret):
    """Pad the sorted streams, split the 5 channels into 3 bf16 parts each,
    and run the kernel.  Returns the dense (b, 8, out_pad) f32 output."""
    block = INNER * CHUNK
    mp = pl.cdiv(total, block) * block
    pad = mp - total
    if pad:
        sk = jnp.pad(sk, ((0, 0), (0, pad)), constant_values=live)
        chans = [jnp.pad(a, ((0, 0), (0, pad))) for a in chans]

    # 5 channels x 3 bf16 precision parts (+1 zero row), stacked per chunk:
    # the kernel's per-chunk dynamic index lands on an untiled leading dim
    # (no sublane-alignment proof needed) and each (16, CHUNK) slab is an
    # exact row of bf16 tiles
    nchunks = mp // CHUNK
    parts = [p for ch in chans for p in _split3(ch)]
    order = (  # row i of the LHS = parts[order[i]]: hi rows 0-4, mid 5-9, ...
        [3 * c for c in range(5)]
        + [3 * c + 1 for c in range(5)]
        + [3 * c + 2 for c in range(5)]
    )
    stats16 = jnp.stack(
        [parts[i].reshape(b, nchunks, CHUNK) for i in order]
        + [jnp.zeros((b, nchunks, CHUNK), jnp.bfloat16)],
        axis=2,
    )  # (b, nchunks, 16, CHUNK) bf16

    # per-chunk first keys, prefetched to SMEM (the kernel aligns the
    # window base down to 128)
    bases = sk[:, ::CHUNK].reshape(-1)  # (b * nchunks,)

    out_pad = live + _WIN

    return pl.pallas_call(
        _zbuffer_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 8, out_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, mp // block),
            in_specs=[
                pl.BlockSpec((1, INNER, CHUNK), lambda r, g, _: (r, g, 0)),
                pl.BlockSpec(
                    (1, INNER, 16, CHUNK), lambda r, g, _: (r, g, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((1, 8, out_pad), lambda r, g, _: (r, 0, 0)),
        ),
        interpret=interpret,
    )(
        bases,
        sk.reshape(b, nchunks, CHUNK),
        stats16,
    )


def _densify(out, ch, b, live):
    """Channel ch of the kernel output flattened to the ZBufferStats layout
    (b * live segments + one shared trailing trash element)."""
    zero = jnp.zeros(1, jnp.float32)
    return jnp.concatenate([out[:, ch, :live].reshape(b * live), zero])


@functools.partial(jax.jit, static_argnames=("row_segments", "interpret"))
def zbuffer_stats_sorted_batched_pallas(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload: jnp.ndarray,
    valid: jnp.ndarray,
    row_segments: int,
    interpret: bool = False,
) -> ZBufferStats:
    """Drop-in replacement for ``zbuffer_stats_sorted_batched`` (same
    contract, see scatter.py) with the post-sort pipeline in Pallas.

    Precondition: valid entries must carry FINITE depths — a valid entry
    with inf/NaN depth is treated as a sentinel here (``is_hit`` requires
    ``isfinite``) whereas the sort pipeline would count it.  All callers
    log-compress finite depths, so the difference is unreachable today.

    ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """
    b, m = keys.shape
    live = row_segments - 1
    sk, d, w, sm, (spw,) = _sort_with_sentinels(keys, value, [payload], valid, live)
    out = _run_zbuffer_kernel(
        sk, [d * w, spw, w, d * sm, spw * sm], b, m + live, live, interpret
    )
    return ZBufferStats(*(_densify(out, ch, b, live) for ch in range(5)))


@functools.partial(jax.jit, static_argnames=("row_segments", "interpret"))
def zbuffer_min2_batched_pallas(
    keys: jnp.ndarray,
    value: jnp.ndarray,
    payload1: jnp.ndarray,
    payload2: jnp.ndarray,
    valid: jnp.ndarray,
    row_segments: int,
    interpret: bool = False,
) -> ZBufferMin2:
    """Row-batched :func:`scatter.zbuffer_min2` (min-depth winner with TWO
    payloads) through the same kernel: the winner is the segment's first
    sorted element, so the three outputs are just "first" channels
    (``x * sm`` rows); the remaining two channel slots ride as zeros.

    Same result layout as ``zbuffer_min2`` on flattened row-major keys:
    ``b * (row_segments-1) + 1`` segments, empties 0.  ``payload2`` stays
    exact for integer ids up to 2^24 (the bf16 3-part split is exact f32).
    Precondition: valid entries carry finite depths (see
    :func:`zbuffer_stats_sorted_batched_pallas`).
    """
    b, m = keys.shape
    live = row_segments - 1
    sk, d, w, sm, (sp1, sp2) = _sort_with_sentinels(
        keys, value, [payload1, payload2], valid, live
    )
    zerosrow = jnp.zeros_like(d)
    out = _run_zbuffer_kernel(
        sk, [d * sm, sp1 * sm, sp2 * sm, zerosrow, zerosrow],
        b, m + live, live, interpret,
    )
    return ZBufferMin2(*(_densify(out, ch, b, live) for ch in range(3)))


# ---------------------------------------------------------------------------
# Per-id segment sums over an ALREADY-SORTED dense-id stream (second method's
# per-id averaging, diffusion/second_method.py).  The id table (B*H*W+1
# slots ~ 2 MB/channel) cannot live in VMEM as one output block, so the grid
# walks chunk GROUPS and each group emits a partial (8, _GROUPWIN) window at
# its own 128-aligned base (ids are non-decreasing, so a group of
# INNER*CHUNK elements spans < INNER*CHUNK + 2*128 table slots); the
# partials are recombined with ngroups dynamic-slice adds on the XLA side —
# sequential, but only ~64 small updates instead of a 524k-element scatter.
# ---------------------------------------------------------------------------

# a group's ids are non-decreasing and dense, so INNER*CHUNK elements span
# <= INNER*CHUNK + 1 slots; +127 group-base align-down, +127 chunk-base
# align-down, + _WIN chunk window reach => block + 767, rounded to 128
_GROUPWIN = INNER * CHUNK + 768


def _segsum_kernel(gbase_ref, cbase_ref, sk_ref, st_ref, out_ref):
    g = pl.program_id(0)
    out_ref[...] = jnp.zeros_like(out_ref)
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, _WIN), 1)
    group_base = gbase_ref[g]

    def chunk(i, _):
        # pure-padding chunks (trailing trash ids) land beyond the group
        # window; clamp their base — they contribute exact zeros anyway
        chunk_base = pl.multiple_of(
            jnp.minimum(
                ((cbase_ref[g * INNER + i] >> 7) << 7) - group_base,
                _GROUPWIN - _WIN,
            ),
            128,
        )
        local = sk_ref[0, i].reshape(CHUNK, 1) - group_base - chunk_base
        stats = st_ref[0, i]  # (16, CHUNK) bf16
        oh = (j_ids == local).astype(jnp.bfloat16)
        win = jax.lax.dot_general(
            stats, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        final = jnp.concatenate(
            [
                win[0:5] + win[5:10] + win[10:15],
                jnp.zeros((3, _WIN), jnp.float32),
            ],
            axis=0,
        )
        osl = (0, slice(None), pl.ds(chunk_base, _WIN))
        out_ref[osl] = out_ref[osl] + final
        return 0

    jax.lax.fori_loop(0, INNER, chunk, 0)


@functools.partial(jax.jit, static_argnames=("num_segments", "interpret"))
def segment_sums_sorted_pallas(
    sorted_ids: jnp.ndarray,
    channels: tuple,
    num_segments: int,
    interpret: bool = False,
):
    """Per-segment sums of up to four f32 channels plus the element count,
    for a flat int32 ``sorted_ids`` stream that is NON-DECREASING and DENSE
    (every id in [0, max_id] occurs — e.g. the second method's per-step
    ``dense_renumber`` output).  Returns ``(sums, count)`` where ``sums`` is
    a list of (num_segments,) f32 arrays (one per channel) and ``count`` the
    per-id multiplicity.  Exactness: same 3-part bf16 split as the z-buffer
    kernel (full f32 precision).

    Density is what bounds each chunk's output window; sortedness is what
    makes the group -> table-window mapping monotone.  Elements are padded
    to a block multiple with id ``num_segments - 1`` (slot dropped by no
    one: the pad weight is zero).
    """
    (n,) = sorted_ids.shape
    assert 1 <= len(channels) <= 4
    block = INNER * CHUNK
    np_ = pl.cdiv(n, block) * block
    pad = np_ - n
    sk = sorted_ids
    chans = list(channels)
    ones = jnp.ones((n,), jnp.float32)
    if pad:
        sk = jnp.pad(sk, (0, pad), constant_values=num_segments - 1)
        chans = [jnp.pad(a, (0, pad)) for a in chans]
        ones = jnp.pad(ones, (0, pad))
    while len(chans) < 4:
        chans.append(jnp.zeros_like(ones))
    chans.append(ones)  # count channel: 1.0 is one exact bf16 part

    nchunks = np_ // CHUNK
    ngroups = np_ // block
    parts = [p for ch in chans[:4] for p in _split3(ch)]
    order = (
        [3 * c for c in range(4)] + [12]          # hi rows 0-3, count row 4
        + [3 * c + 1 for c in range(4)] + [12]    # mid rows 5-8, zero row 9
        + [3 * c + 2 for c in range(4)] + [12]    # lo rows 10-13, zero row 14
    )
    zero = jnp.zeros((nchunks, CHUNK), jnp.bfloat16)
    cnt16 = chans[4].reshape(nchunks, CHUNK).astype(jnp.bfloat16)
    rows = []
    for i, o in enumerate(order):
        if o == 12:
            rows.append(cnt16 if i == 4 else zero)
        else:
            rows.append(parts[o].reshape(nchunks, CHUNK))
    stats16 = jnp.stack(rows + [zero], axis=1)  # (nchunks, 16, CHUNK)

    cbases = sk[::CHUNK]  # (nchunks,) first id per chunk
    gbases = (cbases[::INNER] >> 7) << 7  # (ngroups,) aligned group bases

    partials = pl.pallas_call(
        _segsum_kernel,
        out_shape=jax.ShapeDtypeStruct((ngroups, 8, _GROUPWIN), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ngroups,),
            in_specs=[
                pl.BlockSpec((1, INNER, CHUNK), lambda g, *_: (g, 0, 0)),
                pl.BlockSpec((1, INNER, 16, CHUNK), lambda g, *_: (g, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, _GROUPWIN), lambda g, *_: (g, 0, 0)),
        ),
        interpret=interpret,
    )(
        gbases,
        cbases,
        sk.reshape(ngroups, INNER, CHUNK),
        stats16.reshape(ngroups, INNER, 16, CHUNK),
    )

    out_pad = num_segments + _GROUPWIN

    def body(g, acc):
        win = jax.lax.dynamic_slice(acc, (0, gbases[g]), (5, _GROUPWIN))
        return jax.lax.dynamic_update_slice(
            acc, win + partials[g, :5], (0, gbases[g])
        )

    table = jax.lax.fori_loop(
        0, ngroups, body, jnp.zeros((5, out_pad), jnp.float32)
    )
    sums = [table[c, :num_segments] for c in range(len(channels))]
    count = table[4, :num_segments]
    return sums, count
