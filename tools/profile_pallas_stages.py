"""Stage breakdown of the Pallas z-buffer merge at the flagship shape.

Measures (marginal, PERF_NOTES protocol) the cost of progressively longer
prefixes of ``zbuffer_stats_sorted_batched_pallas``:

  sort   = _sort_with_sentinels only
  prep   = sort + channel products + _split3 + stack (everything up to the
           pallas_call)
  full   = the whole pipeline

plus isolated sort variants (operand/key-count ablation) to size the
headroom in sort1.

python tools/profile_pallas_stages.py
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
from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import (  # noqa: E402
    _BIG,
    _order_bits,
)


def main():
    rng = np.random.default_rng(0)
    b, m, row_segs = 8, 524288, 116737
    live = row_segs - 1
    keys = jnp.asarray(rng.integers(0, live, (b, m)), jnp.int32)
    value = jnp.asarray(rng.uniform(0, 10, (b, m)), jnp.float32)
    payload = jnp.asarray(rng.normal(size=(b, m)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(b, m)) > 0.3)

    def chain_of(stage_fn):
        def make(n):
            def f(v0):
                out = 0.0
                v = v0
                for _ in range(n):
                    s = stage_fn(v)
                    out = out + s
                    v = v + s * 1e-12
                return out

            return f

        return make

    def sort_stage(v):
        sk, d, w, sm, (spw,) = zp._sort_with_sentinels(
            keys, v, [payload], valid, live
        )
        return (
            sk[:, :8].sum().astype(jnp.float32)
            + d[:, :8].sum()
            + w[:, :8].sum()
            + sm[:, :8].sum()
            + spw[:, :8].sum()
        )

    def prep_stage(v):
        sk, d, w, sm, (spw,) = zp._sort_with_sentinels(
            keys, v, [payload], valid, live
        )
        chans = [d * w, spw, w, d * sm, spw * sm]
        total = m + live
        block = zp.INNER * zp.CHUNK
        import jax.experimental.pallas as pl

        mp = pl.cdiv(total, block) * block
        pad = mp - total
        if pad:
            sk = jnp.pad(sk, ((0, 0), (0, pad)), constant_values=live)
            chans = [jnp.pad(a, ((0, 0), (0, pad))) for a in chans]
        nchunks = mp // zp.CHUNK
        crows = zp.CHUNK // 128
        parts = [p for ch in chans for p in zp._split3(ch)]
        order = (
            [3 * c for c in range(5)]
            + [3 * c + 1 for c in range(5)]
            + [3 * c + 2 for c in range(5)]
        )
        stats16 = jnp.stack(
            [parts[i].reshape(b, nchunks, crows, 128) for i in order]
            + [jnp.zeros((b, nchunks, crows, 128), jnp.bfloat16)],
            axis=3,
        )
        bases = sk[:, :: zp.CHUNK].reshape(-1)
        return (
            stats16[:, :2].astype(jnp.float32).sum()
            + bases[:8].sum().astype(jnp.float32)
            + sk[:, :8].sum().astype(jnp.float32)
        )

    def full_stage(v):
        st = zp.zbuffer_stats_sorted_batched_pallas(
            keys, v, payload, valid, row_segs
        )
        return sum(getattr(st, f)[:8].sum() for f in st._fields)

    for name, fn in [("sort", sort_stage), ("prep", prep_stage), ("full", full_stage)]:
        ms = marginal(chain_of(fn), (value,)) * 1e3
        print(f"{name:18s}: {ms:7.2f} ms", flush=True)

    # ---- isolated sort ablations (same padded width as the pipeline) ----
    k = jnp.where(valid, keys, live).astype(jnp.int32)
    vb = jnp.where(valid, value, _BIG).astype(jnp.float32)
    syn_k = jnp.broadcast_to(jnp.arange(live, dtype=jnp.int32)[None], (b, live))
    kfull = jnp.concatenate([k, syn_k], axis=1)
    vbfull = jnp.concatenate([vb, jnp.full((b, live), jnp.inf, jnp.float32)], axis=1)
    pfull = jnp.concatenate([payload, jnp.zeros((b, live), jnp.float32)], axis=1)

    def sort_2key_3op(v):
        a, bb, c = jax.lax.sort((kfull, _order_bits(vbfull + v[:1, :1] * 0), pfull), num_keys=2)
        return a[:, :8].sum().astype(jnp.float32) + bb[:, :8].sum() + c[:, :8].sum()

    def sort_1key_3op(v):
        # packed (key << 14 | qdepth) single-key ordering ablation
        q = jnp.clip((vbfull + v[:1, :1] * 0) * 1638.3, 0, 16382).astype(jnp.int32)
        q = jnp.where(jnp.isfinite(vbfull), q, 16383)
        packed = kfull * 16384 + q
        a, bb, c = jax.lax.sort((packed, _order_bits(vbfull), pfull), num_keys=1)
        return a[:, :8].sum().astype(jnp.float32) + bb[:, :8].sum() + c[:, :8].sum()

    def sort_1key_2op(v):
        q = jnp.clip((vbfull + v[:1, :1] * 0) * 1638.3, 0, 16382).astype(jnp.int32)
        q = jnp.where(jnp.isfinite(vbfull), q, 16383)
        packed = kfull * 16384 + q
        a, bb = jax.lax.sort((packed, pfull), num_keys=1)
        return a[:, :8].sum().astype(jnp.float32) + bb[:, :8].sum()

    def sort_2key_4op(v):
        a, bb, c, dd = jax.lax.sort(
            (kfull, _order_bits(vbfull + v[:1, :1] * 0), pfull, pfull), num_keys=2
        )
        return (
            a[:, :8].sum().astype(jnp.float32)
            + bb[:, :8].sum()
            + c[:, :8].sum()
            + dd[:, :8].sum()
        )

    for name, fn in [
        ("sort 2key 3op", sort_2key_3op),
        ("sort 1key 3op", sort_1key_3op),
        ("sort 1key 2op", sort_1key_2op),
        ("sort 2key 4op", sort_2key_4op),
    ]:
        ms = marginal(chain_of(fn), (value,)) * 1e3
        print(f"{name:18s}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
