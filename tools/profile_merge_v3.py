"""Full-merge marginal cost with selectable z-buffer implementation.

python tools/profile_merge_v3.py [views] [impl...]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from simultaneous_diffusion_for_pointclouds_tpu.diffusion import consistency
from simultaneous_diffusion_for_pointclouds_tpu.ops import scatter
from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import kitti_sampler_grid


from _marginal import marginal  # noqa: E402


def main(views=8, impls=("zbuffer_stats_sorted", "zbuffer_stats_sorted_v3"),
         variant="offsets"):
    h, w = 64, 1024
    grid = kitti_sampler_grid(h, w)
    A = B = views
    cfg = consistency.ConsistencyConfig(
        grid=grid, actual_batch_size=A, setting=5, variant=variant
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, 2, h, w)), jnp.float32)
    sky = jnp.ones((B, 1, h, w), jnp.float32)
    exist = jnp.ones((B, h, w), jnp.float32)
    origins = jnp.asarray(rng.uniform(-10, 10, (A, 3)), jnp.float32)
    if variant == "poses":
        tw = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
        tw[:, :3, 3] = rng.uniform(-10, 10, (B, 3))
        to_world = jnp.asarray(tw)
        from_world = jnp.asarray(np.linalg.inv(tw))
        kwargs = dict(to_world=to_world, from_world=from_world)
    else:
        kwargs = dict(origins=origins)

    def merge_chain(n):
        def f(x):
            for _ in range(n):
                ni, mi, th = consistency.shared_view_images(
                    x, sky, exist, cfg, 1.0, **kwargs
                )
                x = x + 1e-6 * ni + 1e-9 * mi
            return x
        return f

    for name in impls:
        if name.startswith("sorted_batched") or name == "pallas":
            globals()["cfg_cur"] = None
            import dataclasses as _dc
            cfg2 = _dc.replace(cfg, merge_impl=name)
            def merge_chain2(n, cfg2=cfg2):
                def f(x):
                    for _ in range(n):
                        ni, mi, th = consistency.shared_view_images(
                            x, sky, exist, cfg2, 1.0, **kwargs
                        )
                        x = x + 1e-6 * ni + 1e-9 * mi
                    return x
                return f
            ms = marginal(merge_chain2, (x,)) * 1e3
        else:
            consistency.zbuffer_stats = getattr(scatter, name)
            ms = marginal(merge_chain, (x,)) * 1e3
        print(f"merge [{variant}] with {name:28s}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    variant = "offsets"
    rest = sys.argv[2:]
    if rest and rest[0] in ("offsets", "poses"):
        variant, rest = rest[0], rest[1:]
    impls = rest or ("zbuffer_stats_sorted", "zbuffer_stats_sorted_v3")
    main(v, impls, variant)
