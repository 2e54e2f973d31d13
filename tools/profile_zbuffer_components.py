"""Component-level marginal costs of the batched sorted z-buffer at the
flagship shape (B=8 target views, M=A*N=524288 source points per view).

python tools/profile_zbuffer_components.py [views]
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
    print(f"B={B} M={M} row_segs={row_segs}", flush=True)

    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, live, (B, M)), jnp.int32)
    value = jnp.asarray(rng.uniform(0, 10, (B, M)), jnp.float32)
    payload = jnp.asarray(rng.normal(size=(B, M)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(B, M)) > 0.3)

    # --- sort1: 3-operand 2-key per-row sort ---------------------------
    def sort1_chain(n):
        def f(value):
            out = 0.0
            v = value
            for _ in range(n):
                sk, sv, sp = jax.lax.sort(
                    (keys, jax.lax.bitcast_convert_type(v, jnp.int32), payload),
                    num_keys=2,
                )
                out = out + sp[:, :8].sum() + sk[:, :8].sum()
                v = v + 1e-7 * sp  # data dependency
            return out
        return f

    print(f"sort1 (3op 2key rowwise)  : {marginal(sort1_chain,(value,))*1e3:7.2f} ms", flush=True)

    # presorted inputs for the post-sort stages
    sk, s_vbits, sp = jax.lax.sort(
        (keys, jax.lax.bitcast_convert_type(value, jnp.int32), payload), num_keys=2
    )
    sk, s_vbits, sp = jax.block_until_ready((sk, s_vbits, sp))

    def post(n, compaction):
        def f(s_vbits):
            out = 0.0
            vb = s_vbits
            for _ in range(n):
                sv = (sk != live).astype(jnp.float32)
                d = jax.lax.bitcast_convert_type(vb, jnp.float32) * sv
                spp = sp * sv
                change = sk[:, 1:] != sk[:, :-1]
                start = jnp.concatenate([jnp.ones((B, 1), bool), change], axis=1)
                sums, firsts = scatter._segmented_scan_2d(
                    jnp.stack([d, spp, sv], -1), jnp.stack([d, spp], -1), start
                )
                if compaction == "none":
                    res = (sums[:, -1, 0] + firsts[:, -1, 0]).sum()
                elif compaction == "sort":
                    end = jnp.concatenate([change, jnp.ones((B, 1), bool)], axis=1)
                    big_key = jnp.int32(jnp.iinfo(jnp.int32).max)
                    okey = jnp.where(end & (sk != live), sk, big_key)
                    n_ = min(row_segs, M)
                    co, c0, c1, c2, c3, c4 = jax.lax.sort(
                        (okey, sums[..., 0], sums[..., 1], sums[..., 2],
                         firsts[..., 0], firsts[..., 1]), num_keys=1)
                    co = co[:, :n_]
                    num_segments = B * live + 1
                    row_off = jnp.arange(B, dtype=jnp.int32)[:, None] * live
                    idx = jnp.where(co < live, co + row_off, num_segments).reshape(-1)

                    def densify(col):
                        return jnp.zeros(num_segments, jnp.float32).at[idx].set(
                            col[:, :n_].reshape(-1), mode="drop", unique_indices=True)
                    res = sum(densify(c).sum() for c in (c0, c1, c2, c3, c4))
                else:  # gather
                    q = jax.lax.broadcasted_iota(jnp.int32, (B, live), 1)
                    lo = jnp.zeros((B, live), jnp.int32)
                    hi = jnp.full((B, live), M, jnp.int32)
                    for _r in range(M.bit_length()):
                        mid = (lo + hi) >> 1
                        skm = jnp.take_along_axis(sk, jnp.clip(mid, 0, M - 1), axis=1)
                        go_right = skm <= q
                        lo = jnp.where(go_right, mid + 1, lo)
                        hi = jnp.where(go_right, hi, mid)
                    pos = lo - 1
                    cpos = jnp.clip(pos, 0, M - 1)
                    found = ((pos >= 0) & (jnp.take_along_axis(sk, cpos, axis=1) == q)
                             ).astype(jnp.float32)
                    cols = [sums[..., 0], sums[..., 1], sums[..., 2],
                            firsts[..., 0], firsts[..., 1]]
                    res = sum((jnp.take_along_axis(c, cpos, axis=1) * found).sum()
                              for c in cols)
                out = out + res
                # real (non-foldable) dependency: res*0 would constant-fold
                # and let XLA CSE the chain (see profile_compaction.py)
                vb = vb + (res.astype(jnp.int32) & 1)
            return out
        return f

    for name in ("none", "sort", "gather"):
        ms = marginal(lambda n, name=name: post(n, name), (s_vbits,)) * 1e3
        print(f"scans + compaction={name:6s}: {ms:7.2f} ms", flush=True)

    # --- end-to-end variants ------------------------------------------
    for fn_name in ("zbuffer_stats_sorted_batched", "zbuffer_stats_sorted_batched_gather"):
        fn = getattr(scatter, fn_name)

        def full_chain(n, fn=fn):
            def f(value):
                out = 0.0
                v = value
                for _ in range(n):
                    st = fn(keys, v, payload, valid, row_segs)
                    res = sum(getattr(st, f_).sum() for f_ in st._fields)
                    out = out + res
                    v = v + res * 1e-12  # non-foldable dependency
                return out
            return f

        print(f"{fn_name:36s}: {marginal(full_chain,(value,))*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
