"""Sub-part costs of the batched z-buffer compaction at the flagship shape.

Every chained iteration feeds a REAL (non-foldable, nonzero) function of the
previous output back into the next op's operands, so XLA cannot CSE the
chain (x * 0 gets constant-folded — an earlier version of this file measured
negative marginals because of it).

python tools/profile_compaction.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simultaneous_diffusion_for_pointclouds_tpu.ops import scatter
from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import kitti_sampler_grid


from _marginal import marginal  # noqa: E402


def main(views=8):
    h, w = 64, 1024
    grid = kitti_sampler_grid(h, w)
    big = grid.big_rows
    B = views
    M = views * h * w
    row_segs = big * w + 1
    live = row_segs - 1
    n = min(row_segs, M)
    num_segments = B * live + 1
    print(f"B={B} M={M} live={live} n={n}", flush=True)

    rng = np.random.default_rng(0)
    keys = jnp.asarray(np.sort(rng.integers(0, live, (B, M)), axis=1), jnp.int32)
    change = keys[:, 1:] != keys[:, :-1]
    end = jnp.concatenate([change, jnp.ones((B, 1), bool)], axis=1)
    cols = [jnp.asarray(rng.normal(size=(B, M)), jnp.float32) for _ in range(5)]
    big_key = jnp.int32(jnp.iinfo(jnp.int32).max)
    okey = jax.block_until_ready(jnp.where(end, keys, big_key))
    row_off = jnp.arange(B, dtype=jnp.int32)[:, None] * live

    def dep(c, scalar):
        """Feed scalar back into c: non-foldable, tiny actual change."""
        return c + scalar * 1e-12

    # --- A: 6-operand compaction sort alone ----------------------------
    def sortA(nreps):
        def f(c0):
            out = 0.0
            c = c0
            for _ in range(nreps):
                so = jax.lax.sort((okey, c, *cols[1:]), num_keys=1)
                s = so[1][:, :8].sum()
                out = out + s
                c = dep(c, s)
            return out
        return f

    print(f"sort2 6-operand           : {marginal(sortA,(cols[0],))*1e3:7.2f} ms", flush=True)

    # --- B: 2-operand (okey, pos) sort alone ---------------------------
    def sortB(nreps):
        def f(c0):
            out = 0.0
            ok2 = okey
            for _ in range(nreps):
                co, cpos = jax.lax.sort((ok2, jnp.broadcast_to(
                    jnp.arange(M, dtype=jnp.int32)[None], (B, M)).astype(jnp.int32)), num_keys=1)
                s = cpos[:, :8].sum()
                out = out + s
                ok2 = jnp.minimum(ok2, big_key - (s % 2))  # non-foldable dep
            return out.astype(jnp.float32)
        return f

    print(f"sort2 2-operand (okey,pos): {marginal(sortB,(cols[0],))*1e3:7.2f} ms", flush=True)

    # --- C: 5 small densify scatters alone -----------------------------
    co, *scols = jax.lax.sort((okey, *cols), num_keys=1)
    co = jax.block_until_ready(co[:, :n])
    scols = [jax.block_until_ready(c[:, :n]) for c in scols]
    idx = jnp.where(co < live, co + row_off, num_segments).reshape(-1)

    def scatters(sorted_flag):
        def make(nreps):
            def f(c0):
                out = 0.0
                c = c0
                for _ in range(nreps):
                    for col in [c] + scols[1:]:
                        d = jnp.zeros(num_segments, jnp.float32).at[idx].set(
                            col.reshape(-1), mode="drop", unique_indices=True,
                            indices_are_sorted=sorted_flag,
                        )
                        out = out + d[:8].sum()
                    c = dep(c, out)
                return out
            return f
        return make

    print(f"5 scatters (unsorted hint): {marginal(scatters(False),(scols[0],))*1e3:7.2f} ms", flush=True)
    print(f"5 scatters (sorted hint)  : {marginal(scatters(True),(scols[0],))*1e3:7.2f} ms", flush=True)

    # --- D: 5 gathers (B, n) from (B, M) -------------------------------
    cpos = jax.block_until_ready(
        jax.lax.sort((okey, jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None], (B, M)).astype(jnp.int32)), num_keys=1)[1][:, :n])

    def gathers(nreps):
        def f(c0):
            out = 0.0
            c = c0
            for _ in range(nreps):
                for col in [c] + cols[1:]:
                    g = jnp.take_along_axis(col, cpos, axis=1)
                    out = out + g[:, :8].sum()
                c = dep(c, out)
            return out
        return f

    print(f"5 gathers (B,n) from (B,M): {marginal(gathers,(cols[0],))*1e3:7.2f} ms", flush=True)

    # --- E: full current batched z-buffer (reference point) ------------
    value = jnp.asarray(rng.uniform(0, 10, (B, M)), jnp.float32)
    payload = cols[1]
    valid = jnp.asarray(rng.uniform(size=(B, M)) > 0.3)
    ukeys = jnp.asarray(rng.integers(0, live, (B, M)), jnp.int32)

    def full_chain(nreps):
        def f(v0):
            out = 0.0
            v = v0
            for _ in range(nreps):
                st = scatter.zbuffer_stats_sorted_batched(ukeys, v, payload, valid, row_segs)
                s = sum(getattr(st, f_)[:8].sum() for f_ in st._fields)
                out = out + s
                v = dep(v, s)
            return out
        return f

    print(f"full sorted_batched       : {marginal(full_chain,(value,))*1e3:7.2f} ms", flush=True)

    # --- F: scans (on device data, real dependency) --------------------
    sk = keys

    def scans(nreps):
        def f(v0):
            out = 0.0
            d = v0
            for _ in range(nreps):
                sv = (sk != live).astype(jnp.float32)
                start = jnp.concatenate(
                    [jnp.ones((B, 1), bool), sk[:, 1:] != sk[:, :-1]], axis=1)
                sums, firsts = scatter._segmented_scan_2d(
                    jnp.stack([d, payload, sv], -1), jnp.stack([d, payload], -1), start)
                s = sums[:, -1, 0].sum() + firsts[:, -1, 0].sum()
                out = out + s
                d = dep(d, s)
            return out
        return f

    print(f"scans alone               : {marginal(scans,(value,))*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
