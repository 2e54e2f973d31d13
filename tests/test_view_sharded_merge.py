"""shard_map merge == batched merge, on an 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simultaneous_diffusion_for_pointclouds_tpu.diffusion.consistency import (
    ConsistencyConfig,
    effective_origins,
    shared_view_images,
)
from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import kitti_sampler_grid
from simultaneous_diffusion_for_pointclouds_tpu.parallel import make_mesh
from simultaneous_diffusion_for_pointclouds_tpu.parallel.view_sharded_merge import (
    make_view_sharded_merge,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

G, A, H, W = 4, 4, 8, 16
B = G * A


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, 0.9, (B, 2, H, W)).astype(np.float32)
    sky = (rng.uniform(size=(B, 1, H, W)) > 0.2).astype(np.float32)
    exist = (rng.uniform(size=(B, H, W)) > 0.1).astype(np.float32)
    mats = []
    for _ in range(B):
        ang = rng.uniform(-0.3, 0.3)
        c, s = np.cos(ang), np.sin(ang)
        m = np.eye(4, dtype=np.float32)
        m[:2, :2] = [[c, -s], [s, c]]
        m[:3, 3] = rng.uniform(-8, 8, 3) * [1, 1, 0.2]
        mats.append(m)
    to_world = np.stack(mats)
    from_world = np.linalg.inv(to_world).astype(np.float32)
    return x, sky, exist, to_world, from_world


@pytest.mark.parametrize(
    "variant,setting",
    [
        # the poses case costs ~27 s on the 1-core box -> slow tier; the
        # offsets case stays in the fast tier as mesh-merge coverage
        pytest.param("poses", 5, marks=pytest.mark.slow),
        ("offsets", 7),
    ],
)
def test_sharded_merge_matches_batched(variant, setting):
    mesh = make_mesh(n_view=2)
    grid = kitti_sampler_grid(H, W)
    ccfg = ConsistencyConfig(
        grid=grid, actual_batch_size=A, setting=setting, variant=variant
    )
    x, sky, exist, to_world, from_world = _inputs()
    origins = np.asarray(
        effective_origins([[0, 0, 0], [5, -5, 0], [-5, 5, 0], [10, 0, 0]]),
        np.float32,
    )
    sigma_mod = 1.3

    ref_imgs, ref_masks, ref_high = shared_view_images(
        jnp.asarray(x), jnp.asarray(sky), jnp.asarray(exist), ccfg,
        jnp.float32(sigma_mod),
        origins=jnp.asarray(origins),
        to_world=jnp.asarray(to_world), from_world=jnp.asarray(from_world),
    )

    merge = make_view_sharded_merge(mesh, ccfg)
    out_imgs, out_masks, out_high = merge(
        jnp.asarray(x.reshape(G, A, 2, H, W)),
        jnp.asarray(sky.reshape(G, A, 1, H, W)),
        jnp.asarray(exist[:A]),
        jnp.asarray(to_world.reshape(G, A, 4, 4)),
        jnp.asarray(from_world.reshape(G, A, 4, 4)),
        jnp.asarray(origins),
        sigma_mod,
    )

    np.testing.assert_allclose(
        np.asarray(out_imgs).reshape(B, 2, H, W), np.asarray(ref_imgs),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_masks).reshape(B, 1, H, W), np.asarray(ref_masks)
    )
    assert bool(out_high) == bool(ref_high)
