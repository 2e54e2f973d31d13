"""Call-site wiring of merge_impl="pallas" exercised on CPU (ADVICE r2).

The pallas ops are interpret-tested directly elsewhere; these tests force
the production call sites (consistency.shared_view_images and the second
method's min2 branch) through the pallas path on the CPU (interpret mode is
auto-enabled off-TPU) and compare end to end against the sort pipelines —
checking arg order, (B, T) broadcasts and row_segments wiring.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simultaneous_diffusion_for_pointclouds_tpu.diffusion.consistency import (
    ConsistencyConfig,
    shared_view_images,
)
from simultaneous_diffusion_for_pointclouds_tpu.diffusion.langevin import (
    LangevinConfig,
)
from simultaneous_diffusion_for_pointclouds_tpu.diffusion.second_method import (
    SecondMethodConfig,
    mine_sampler_grid,
    simultaneous_second_method_sample,
)
from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import (
    kitti_sampler_grid,
)


def _frac_close(a, b, tol=1e-4):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b)) <= tol))


def test_auto_dispatch_rules(monkeypatch):
    """auto = pallas for EVERY merge on TPU (round 3 — the flat-layout
    kernel beats the dense pipeline even where XLA DCEs the min channels),
    dense/flat sort pipelines off-TPU."""
    grid = kitti_sampler_grid(8, 32)
    cfg = ConsistencyConfig(
        grid=grid, actual_batch_size=2, setting=4, variant="offsets"
    )
    scfg = SecondMethodConfig(grid=mine_sampler_grid(8, 32), setting=4)
    assert cfg.resolved_merge_impl == "sorted_batched_dense"
    assert scfg.resolved_merge_impl == "flat"
    import simultaneous_diffusion_for_pointclouds_tpu.diffusion.consistency as cmod
    import simultaneous_diffusion_for_pointclouds_tpu.diffusion.second_method as smod

    monkeypatch.setattr(cmod.jax, "default_backend", lambda: "tpu")
    assert cfg.resolved_merge_impl == "pallas"
    assert smod.jax.default_backend() == "tpu"  # same module object
    assert scfg.resolved_merge_impl == "pallas"


@pytest.mark.parametrize("variant,setting", [("poses", 5), ("offsets", 7)])
def test_shared_view_images_pallas_call_site(variant, setting):
    h, w, a, g = 8, 32, 2, 2
    b = g * a
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (b, 2, h, w), jnp.float32) * 0.4 + 0.05
    sky = jnp.ones((b, 1, h, w), jnp.float32)
    exist = jnp.ones((b, h, w), jnp.float32)
    grid = kitti_sampler_grid(h, w)
    kw = (
        dict(origins=jnp.asarray([[0.0, 0.0, 0.0], [10.0, -10.0, 0.0]]))
        if variant == "offsets"
        else dict(
            to_world=jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1)),
            from_world=jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1)),
        )
    )
    outs = {}
    for impl in ("pallas", "sorted_batched_dense", "sorted_batched"):
        cfg = ConsistencyConfig(
            grid=grid, actual_batch_size=a, setting=setting, variant=variant,
            merge_impl=impl,
        )
        assert cfg.resolved_merge_impl == impl
        ni, mi, th = jax.jit(
            lambda x, sky, exist, cfg=cfg, kw=kw: shared_view_images(
                x, sky, exist, cfg, jnp.float32(1.0), **kw
            )
        )(x, sky, exist)
        outs[impl] = (np.asarray(ni), np.asarray(mi))
    for impl in ("sorted_batched_dense", "sorted_batched"):
        assert _frac_close(outs["pallas"][0], outs[impl][0]) > 0.999, impl
        np.testing.assert_array_equal(outs["pallas"][1], outs[impl][1])


def test_second_method_pallas_call_site():
    h, w, b = 8, 32, 2
    grid = mine_sampler_grid(h, w)
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (b, 2, h, w), jnp.float32) * 0.4 + 0.05
    refer = jax.random.uniform(jax.random.PRNGKey(2), (b, 2, h, w), jnp.float32)
    mask = (jax.random.uniform(jax.random.PRNGKey(3), (b, 2, h, w)) > 0.6).astype(
        jnp.float32
    )
    indices = jnp.where(
        mask[:, :1] > 0,
        jnp.arange(b * h * w, dtype=jnp.float32).reshape(b, 1, h, w),
        -1.0,
    )
    origins = jnp.asarray([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]], jnp.float32)
    sigmas = jnp.asarray([2.0, 0.5], jnp.float32)
    lcfg = LangevinConfig(n_steps_each=2, step_lr=1e-5, denoise=True, noise_scale=0.0)

    def score_fn(inp, lbl):
        return -0.1 * inp  # fake linear score net (parity-test convention)

    outs = {}
    for impl in ("pallas", "flat"):
        scfg = SecondMethodConfig(grid=grid, setting=4, merge_impl=impl)
        assert scfg.resolved_merge_impl == impl
        outs[impl] = np.asarray(
            jax.jit(
                lambda x: simultaneous_second_method_sample(
                    jax.random.PRNGKey(0), x, score_fn, sigmas, lcfg, scfg,
                    refer_image=refer, refer_mask=mask, refer_indices=indices,
                    origins=origins, grad_ref=1.0,
                )
            )(x)
        )
    assert np.isfinite(outs["pallas"]).all()
    assert _frac_close(outs["pallas"], outs["flat"]) > 0.999


def test_gather_variant_warns_profiling_only():
    """sorted_batched_gather is measured pathological on TPU (202 ms vs
    38 ms, PERF_NOTES); the config must flag any production selection of
    it loudly while staying usable for the equivalence sweep (VERDICT r4
    weak #4)."""
    import warnings

    grid = kitti_sampler_grid(8, 32)
    cfg = ConsistencyConfig(
        grid=grid, actual_batch_size=2, merge_impl="sorted_batched_gather"
    )
    with pytest.warns(UserWarning, match="profiling-only"):
        assert cfg.resolved_merge_impl == "sorted_batched_gather"

    # non-pathological selections stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for impl in ("auto", "pallas", "sorted_batched_dense", "sorted"):
            dataclasses.replace(cfg, merge_impl=impl).resolved_merge_impl

    with pytest.raises(NotImplementedError):
        dataclasses.replace(cfg, merge_impl="nope").resolved_merge_impl
