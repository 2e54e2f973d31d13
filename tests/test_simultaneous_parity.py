"""End-to-end parity: fused simultaneous samplers vs the reference torch
implementations (offset-origin "basic" and pose-matrix "kitti" variants).

Both sides run deterministically (``torch.randn_like`` stubbed to zeros /
``noise_scale=0``) with the same linear fake score net, so any mismatch
beyond float reassociation noise is a logic bug.  A tiny fraction of pixels
may legitimately flip projection bins because the reference mixes
float32/float64 while we stay float32; the assertions therefore bound the
mismatch *fraction* as well as the typical error.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from simultaneous_diffusion_for_pointclouds_tpu.diffusion.consistency import (
    ConsistencyConfig,
    effective_origins,
)
from simultaneous_diffusion_for_pointclouds_tpu.diffusion.langevin import (
    LangevinConfig,
    anneal_langevin_dynamics,
    anneal_langevin_inpainting,
    simultaneous_inpainting_sample,
)
from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import kitti_sampler_grid

REF = "/root/reference/LiDARGen"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")

H, W, A, G = 8, 16, 2, 2
B = A * G


@pytest.fixture(scope="module")
def ref_models():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    import models as ref_models_pkg
    import models.KITTISampling as ref_kitti

    return ref_models_pkg, ref_kitti


def _scorenet_torch(x, labels):
    return -0.2 * x


def _scorenet_jax(x, labels):
    return -0.2 * x


def _sigmas():
    return np.exp(np.linspace(np.log(2.0), np.log(0.05), 4)).astype(np.float32)


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, 0.9, (B, 2, H, W)).astype(np.float32)
    refer = rng.uniform(0.05, 0.9, (B, 2, H, W)).astype(np.float32)
    mask1 = (rng.uniform(size=(B, 1, H, W)) > 0.5).astype(np.float32)
    mask = np.concatenate([mask1, mask1], axis=1)
    sky = (rng.uniform(size=(B, 1, H, W)) > 0.2).astype(np.float32)
    exist = rng.uniform(size=(B, H, W)) > 0.1
    return x, refer, mask, sky, exist


def _poses(seed=1):
    rng = np.random.default_rng(seed)
    mats = []
    for i in range(B):
        ang = rng.uniform(-0.3, 0.3)
        c, s = np.cos(ang), np.sin(ang)
        m = np.eye(4)
        m[:2, :2] = [[c, -s], [s, c]]
        m[:3, 3] = rng.uniform(-8, 8, 3) * [1, 1, 0.2]
        mats.append(m)
    to_world = np.stack(mats)
    from_world = np.linalg.inv(to_world)
    return to_world, from_world


def _assert_close(ours, ref, frac=0.995, tol=1e-3):
    ours, ref = np.asarray(ours), np.asarray(ref)
    diff = np.abs(ours - ref)
    ok = (diff < tol).mean()
    assert np.median(diff) < 1e-5, f"median diff {np.median(diff)}"
    assert ok >= frac, f"only {ok:.4%} of pixels within {tol}; max={diff.max()}"


def test_unconditional_parity(ref_models):
    ref_pkg, _ = ref_models
    x, *_ = _inputs()
    sigmas = _sigmas()
    out_ref = ref_pkg.anneal_Langevin_dynamics(
        torch.from_numpy(x.copy()), _scorenet_torch, torch.from_numpy(sigmas),
        n_steps_each=3, step_lr=1e-4, final_only=True, denoise=True,
    )[-1].numpy()
    cfg = LangevinConfig(n_steps_each=3, step_lr=1e-4, denoise=True, noise_scale=0.0)
    ours = anneal_langevin_dynamics(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax, jnp.asarray(sigmas), cfg
    )
    np.testing.assert_allclose(np.asarray(ours), out_ref, rtol=1e-4, atol=1e-5)


def test_inpainting_parity(ref_models):
    ref_pkg, _ = ref_models
    x, refer, mask, *_ = _inputs()
    sigmas = _sigmas()
    images, _ = ref_pkg.anneal_Langevin_dynamics_inpainting(
        torch.from_numpy(x.copy()), torch.from_numpy(refer), torch.from_numpy(mask),
        _scorenet_torch, torch.from_numpy(sigmas),
        n_steps_each=3, step_lr=1e-4, denoise=True, verbose=False, grad_ref=0.3,
    )
    out_ref = images[-1].numpy()
    cfg = LangevinConfig(n_steps_each=3, step_lr=1e-4, denoise=True, noise_scale=0.0)
    ours = anneal_langevin_inpainting(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), jnp.asarray(refer), jnp.asarray(mask),
        _scorenet_jax, jnp.asarray(sigmas), cfg, grad_ref=0.3,
    )
    np.testing.assert_allclose(np.asarray(ours), out_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("setting", [5, 7])
def test_simultaneous_basic_parity(ref_models, setting):
    ref_pkg, _ = ref_models
    x, refer, mask, sky, exist = _inputs(seed=setting)
    sigmas = _sigmas()
    mods = np.array([[0, 0, 0], [5, -5, 0]])
    mods_t = torch.from_numpy(mods)

    images, _, _ = ref_pkg.anneal_Langevin_dynamics_inpainting_simultaneous_basic(
        torch.from_numpy(x.copy()), torch.from_numpy(refer), torch.from_numpy(mask),
        torch.from_numpy(sky), None, 1, setting, _scorenet_torch,
        torch.from_numpy(sigmas), mods_t, A,
        n_steps_each=2, step_lr=1e-4, existMask=torch.from_numpy(exist),
        denoise=True, verbose=False, grad_ref=0.3, correlation_coefficient=0.05,
    )
    out_ref = images[-1].numpy()

    ccfg = ConsistencyConfig(
        grid=kitti_sampler_grid(H, W), actual_batch_size=A, setting=setting,
        variant="offsets",
    )
    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=True, noise_scale=0.0)
    ours = simultaneous_inpainting_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax, jnp.asarray(sigmas),
        cfg, ccfg,
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        sky=jnp.asarray(sky), exist_mask=jnp.asarray(exist.astype(np.float32)),
        min_step_to_share=1, grad_ref=0.3, correlation_coefficient=0.05,
        origins=jnp.asarray(effective_origins(mods), jnp.float32),
    )
    _assert_close(ours, out_ref)


@pytest.mark.parametrize("setting", [5, 6])
def test_simultaneous_kitti_parity(ref_models, setting):
    _, ref_kitti = ref_models
    x, refer, mask, sky, exist = _inputs(seed=10 + setting)
    sigmas = _sigmas()
    to_world, from_world = _poses()

    images, _, _ = ref_kitti.anneal_Langevin_dynamics_inpainting_simultaneous_basic_kitti(
        torch.from_numpy(x.copy()), torch.from_numpy(refer), torch.from_numpy(mask),
        torch.from_numpy(sky), None, 1, setting, 10.0, _scorenet_torch,
        torch.from_numpy(sigmas), torch.from_numpy(from_world), torch.from_numpy(to_world),
        A, n_steps_each=2, step_lr=1e-4, existMask=torch.from_numpy(exist),
        denoise=True, verbose=False, grad_ref=0.3, correlation_coefficient=0.05,
    )
    out_ref = images[-1].numpy()

    ccfg = ConsistencyConfig(
        grid=kitti_sampler_grid(H, W), actual_batch_size=A, setting=setting,
        allowance=10.0, variant="poses",
    )
    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=True, noise_scale=0.0)
    ours = simultaneous_inpainting_sample(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), _scorenet_jax, jnp.asarray(sigmas),
        cfg, ccfg,
        refer_image=jnp.asarray(refer), refer_mask=jnp.asarray(mask),
        sky=jnp.asarray(sky), exist_mask=jnp.asarray(exist.astype(np.float32)),
        min_step_to_share=1, grad_ref=0.3, correlation_coefficient=0.05,
        to_world=jnp.asarray(to_world, jnp.float32),
        from_world=jnp.asarray(from_world, jnp.float32),
    )
    _assert_close(ours, out_ref)
