"""Second-method sampler: smoke + deterministic parity vs the reference."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from simultaneous_diffusion_for_pointclouds_tpu.diffusion.consistency import (
    effective_origins,
)
from simultaneous_diffusion_for_pointclouds_tpu.diffusion.langevin import LangevinConfig
from simultaneous_diffusion_for_pointclouds_tpu.diffusion.second_method import (
    SecondMethodConfig,
    mine_sampler_grid,
    simultaneous_second_method_sample,
)

REF = "/root/reference/LiDARGen"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")

B, H, W = 2, 8, 16


def _scorenet_torch(x, labels):
    return -0.2 * x


def _scorenet_jax(x, labels):
    return -0.2 * x


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, 0.9, (B, 2, H, W)).astype(np.float32)
    refer = rng.uniform(0.05, 0.9, (B, 2, H, W)).astype(np.float32)
    mask1 = (rng.uniform(size=(B, 1, H, W)) > 0.5).astype(np.float32)
    mask = np.concatenate([mask1, mask1], axis=1)
    sky = (rng.uniform(size=(B, 1, H, W)) > 0.2).astype(np.float32)
    # per-pixel point ids with some holes
    ids = rng.integers(-1, 40, (B, 1, H, W)).astype(np.float64)
    return x, refer, mask, sky, ids


def test_second_method_parity_setting4():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    torch.set_default_tensor_type = lambda *a, **k: None
    import models as ref_pkg

    x, refer, mask, sky, ids = _inputs()
    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), 3)).astype(np.float32)
    mods = np.array([[0, 0, 0], [5, -5, 0]])

    images, _, _ = ref_pkg.anneal_Langevin_dynamics_inpainting_simultaneous_second_method(
        torch.from_numpy(x.copy()), torch.from_numpy(refer), torch.from_numpy(mask),
        torch.from_numpy(sky), torch.from_numpy(ids), 0, 4, _scorenet_torch,
        torch.from_numpy(sigmas), torch.from_numpy(mods),
        n_steps_each=2, step_lr=1e-4, denoise=True, verbose=False,
        grad_ref=0.3, correlation_coefficient=0.05,
    )
    out_ref = images[-1].numpy()

    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=True, noise_scale=0.0)
    scfg = SecondMethodConfig(grid=mine_sampler_grid(H, W), setting=4)
    ours = simultaneous_second_method_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax, jnp.asarray(sigmas),
        cfg, scfg,
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        refer_indices=jnp.asarray(ids),
        origins=jnp.asarray(effective_origins(mods), jnp.float32),
        grad_ref=0.3,
    )
    ours, out_ref = np.asarray(ours), np.asarray(out_ref)
    diff = np.abs(ours - out_ref)
    ok = (diff < 1e-3).mean()
    assert np.median(diff) < 1e-5, np.median(diff)
    assert ok >= 0.98, f"{ok:.4%} within tol; max={diff.max()}"


def test_second_method_smoke_setting7():
    x, refer, mask, sky, ids = _inputs(seed=3)
    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), 3)).astype(np.float32)
    mods = np.array([[0, 0, 0], [5, -5, 0]])
    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=True, noise_scale=1.0)
    scfg = SecondMethodConfig(grid=mine_sampler_grid(H, W), setting=7)
    out = simultaneous_second_method_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax, jnp.asarray(sigmas),
        cfg, scfg,
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        refer_indices=jnp.asarray(ids),
        origins=jnp.asarray(effective_origins(mods), jnp.float32),
        grad_ref=0.3,
    )
    out = np.asarray(out)
    assert out.shape == (B, 2, H, W)
    assert np.isfinite(out).all()
