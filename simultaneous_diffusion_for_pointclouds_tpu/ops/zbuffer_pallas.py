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

from .scatter import ZBufferStats, _BIG, _bits_to_float, _order_bits

# chunk of sorted elements processed per inner iteration; the output window
# is CHUNK+128 wide and 128-aligned
CHUNK = 512
# chunks per grid step (amortizes grid overhead; block = INNER*CHUNK elems)
INNER = 16
_WIN = CHUNK + 128


def _zbuffer_kernel(base_ref, sk_ref, st_ref, out_ref):
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    c = CHUNK
    rows = c // 128  # chunk laid out as (rows, 128) sublane x lane tiles
    r0 = pl.program_id(0)
    nchunks = pl.num_programs(1) * INNER
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (_WIN, rows, 128), 0)

    def chunk(i, _):
        base = pl.multiple_of(base_ref[r0 * nchunks + g * INNER + i], 128)
        local = sk_ref[0, i] - base  # (rows, 128) int32
        stats = st_ref[0, i]  # (rows, 16, 128) bf16 — exact bf16 tiles
        oh = (j_ids == local[None]).astype(jnp.bfloat16)  # (_WIN, rows, 128)
        win = jnp.zeros((16, _WIN), jnp.float32)
        for r in range(rows):
            win = win + jax.lax.dot_general(
                stats[r], oh[:, r, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (16, _WIN)
        final = jnp.concatenate(
            [win[0:5] + win[5:10] + win[10:15], jnp.zeros((3, _WIN), jnp.float32)],
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

    ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """
    b, m = keys.shape
    live = row_segments - 1
    k = jnp.where(valid, keys, live).astype(jnp.int32)
    vb = jnp.where(valid, value, _BIG).astype(jnp.float32)

    # dense sentinels: one +inf entry per live key (sorts to segment end)
    syn_k = jnp.broadcast_to(jnp.arange(live, dtype=jnp.int32)[None], (b, live))
    k = jnp.concatenate([k, syn_k], axis=1)
    vb = jnp.concatenate([vb, jnp.full((b, live), jnp.inf, jnp.float32)], axis=1)
    pay = jnp.concatenate(
        [payload.astype(jnp.float32), jnp.zeros((b, live), jnp.float32)], axis=1
    )

    sk, s_vbits, sp = jax.lax.sort((k, _order_bits(vb), pay), num_keys=2)
    sk, s_vbits, sp = jax.lax.optimization_barrier((sk, s_vbits, sp))
    raw = _bits_to_float(s_vbits)
    is_hit = (sk != live) & jnp.isfinite(raw)
    w = is_hit.astype(jnp.float32)
    d = jnp.where(is_hit, raw, 0.0)
    spw = sp * w
    start = jnp.concatenate(
        [jnp.ones((b, 1), bool), sk[:, 1:] != sk[:, :-1]], axis=1
    )
    sm = start.astype(jnp.float32) * w  # exactly one per non-empty key

    # pad the streams to a whole number of grid blocks with trash entries
    block = INNER * CHUNK
    mp = pl.cdiv(m + live, block) * block
    pad = mp - (m + live)
    if pad:
        sk = jnp.pad(sk, ((0, 0), (0, pad)), constant_values=live)
        zf = ((0, 0), (0, pad))
        d, spw, w, sm = (jnp.pad(a, zf) for a in (d, spw, w, sm))

    # 5 channels x 3 bf16 precision parts (+1 zero row), stacked per chunk:
    # (b, nchunks, 16, CHUNK//128, 128) so the kernel's per-chunk dynamic
    # index lands on an untiled leading dim (no sublane-alignment proof
    # needed for the loads)
    nchunks = mp // CHUNK
    crows = CHUNK // 128
    chans = [d * w, spw, w, d * sm, spw * sm]
    parts = [p for ch in chans for p in _split3(ch)]
    order = (  # row i of the LHS = parts[order[i]]: hi rows 0-4, mid 5-9, ...
        [3 * c for c in range(5)]
        + [3 * c + 1 for c in range(5)]
        + [3 * c + 2 for c in range(5)]
    )
    stats16 = jnp.stack(
        [parts[i].reshape(b, nchunks, crows, 128) for i in order]
        + [jnp.zeros((b, nchunks, crows, 128), jnp.bfloat16)],
        axis=3,
    )  # (b, nchunks, crows, 16, 128) bf16 — (16, 128) = one bf16 tile

    # per-chunk 128-aligned window bases, prefetched to SMEM
    bases = ((sk[:, ::CHUNK] >> 7) << 7).reshape(-1)  # (b * nchunks,)

    # out window base can reach live (all-trash chunk); window is _WIN wide
    out_pad = live + _WIN

    grid = (b, mp // block)
    out = pl.pallas_call(
        _zbuffer_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 8, out_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, INNER, crows, 128), lambda r, g, _: (r, g, 0, 0)
                ),
                pl.BlockSpec(
                    (1, INNER, crows, 16, 128),
                    lambda r, g, _: (r, g, 0, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec((1, 8, out_pad), lambda r, g, _: (r, 0, 0)),
        ),
        interpret=interpret,
    )(
        bases,
        sk.reshape(b, nchunks, crows, 128),
        stats16,
    )

    zero = jnp.zeros(1, jnp.float32)  # shared trailing trash segment

    def densify(ch):
        return jnp.concatenate([out[:, ch, :live].reshape(b * live), zero])

    return ZBufferStats(
        densify(0), densify(1), densify(2), densify(3), densify(4)
    )
