"""Parity: DSM losses / data transforms / densification sampler / EMA vs
the reference implementations."""

import argparse
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from simultaneous_diffusion_for_pointclouds_tpu.data.transforms import (
    data_transform,
    inverse_data_transform,
    logit_transform,
)
from simultaneous_diffusion_for_pointclouds_tpu.diffusion.dsm import (
    anneal_dsm_score_estimation,
    anneal_dsm_score_estimation_with_mask,
)
from simultaneous_diffusion_for_pointclouds_tpu.diffusion.langevin import (
    LangevinConfig,
    anneal_langevin_densification,
)
from simultaneous_diffusion_for_pointclouds_tpu.models.ema import ema_init, ema_update

REF = "/root/reference/LiDARGen"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")


def _ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    import importlib.util

    spec = importlib.util.spec_from_file_location("_ref_dsm", f"{REF}/losses/dsm.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _score_torch(x, labels):
    return -0.3 * x


def _score_jax(x, labels):
    return -0.3 * x


def test_masked_dsm_loss_parity():
    ref = _ref()
    rng = np.random.default_rng(0)
    b, c, h, w = 4, 2, 8, 16
    sigmas = np.exp(np.linspace(np.log(5.0), np.log(0.1), 6)).astype(np.float32)
    x = rng.uniform(0, 1, (b, c, h, w)).astype(np.float32)
    noise = rng.normal(size=(b, c, h, w)).astype(np.float32)
    mask = (rng.uniform(size=(b, c, h, w)) > 0.4).astype(np.float32)
    labels = np.array([0, 2, 3, 5])
    used = sigmas[labels].reshape(b, 1, 1, 1)

    loss_ref, scores_ref = ref.anneal_dsm_score_estimation_with_mask(
        _score_torch, torch.from_numpy(x), torch.from_numpy(used),
        torch.from_numpy(noise), torch.from_numpy(mask), None,
        torch.from_numpy(sigmas), torch.from_numpy(labels), 2.0,
    )
    loss, scores = anneal_dsm_score_estimation_with_mask(
        _score_jax, jnp.asarray(x), jnp.asarray(labels), jnp.asarray(sigmas),
        jnp.asarray(noise), jnp.asarray(mask), 2.0,
    )
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(scores), scores_ref.numpy(), rtol=1e-5)


def test_plain_dsm_loss_matches_formula():
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (3, 2, 8, 16))
    sigmas = jnp.asarray(np.exp(np.linspace(np.log(5.0), np.log(0.1), 6)), jnp.float32)
    labels = jnp.array([0, 3, 5])
    loss = anneal_dsm_score_estimation(_score_jax, rng, x, sigmas, labels=labels)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_densification_sampler_parity():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.randn_like = lambda t, **k: torch.zeros_like(t)
    import models as ref_pkg

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 2, 64, 16)).astype(np.float32)
    refer = rng.uniform(0, 1, (2, 2, 64, 16)).astype(np.float32)
    sigmas = np.exp(np.linspace(np.log(2.0), np.log(0.05), 4)).astype(np.float32)
    images, _ = ref_pkg.anneal_Langevin_dynamics_densification(
        torch.from_numpy(x.copy()), torch.from_numpy(refer), _score_torch,
        torch.from_numpy(sigmas), n_steps_each=2, step_lr=1e-4, denoise=True,
        verbose=False, grad_ref=0.2, sampling_step=16,
    )
    out_ref = images[-1].numpy()
    cfg = LangevinConfig(n_steps_each=2, step_lr=1e-4, denoise=True, noise_scale=0.0)
    ours = anneal_langevin_densification(
        jnp.zeros(2, jnp.uint32), jnp.asarray(x), jnp.asarray(refer),
        _score_jax, jnp.asarray(sigmas), cfg, grad_ref=0.2, sampling_step=16,
    )
    np.testing.assert_allclose(np.asarray(ours), out_ref, rtol=1e-4, atol=1e-5)


def test_transforms_identity_with_default_flags():
    ns = argparse.Namespace
    cfg = ns(data=ns(
        uniform_dequantization=False, gaussian_dequantization=False,
        rescaled=False, logit_transform=False,
    ))
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 2, 4, 8)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(data_transform(cfg, x)), np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(inverse_data_transform(cfg, x)), np.clip(np.asarray(x), 0, 1)
    )
    # rescaled round-trip
    cfg2 = ns(data=ns(
        uniform_dequantization=False, gaussian_dequantization=False,
        rescaled=True, logit_transform=False,
    ))
    np.testing.assert_allclose(
        np.asarray(inverse_data_transform(cfg2, data_transform(cfg2, x))),
        np.asarray(x), atol=1e-6,
    )
    # logit matches reference formula
    lt = np.asarray(logit_transform(x))
    lam = 1e-6
    xe = lam + (1 - 2 * lam) * np.asarray(x)
    np.testing.assert_allclose(lt, np.log(xe) - np.log1p(-xe), rtol=1e-5)


def test_ema_matches_reference_recursion():
    params = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    shadow = ema_init(params)
    new = {"a": jnp.full((3,), 2.0), "b": {"c": jnp.full((2, 2), 4.0)}}
    shadow = ema_update(shadow, new, mu=0.9)
    np.testing.assert_allclose(np.asarray(shadow["a"]), 0.9 * 1.0 + 0.1 * 2.0)
    np.testing.assert_allclose(np.asarray(shadow["b"]["c"]), 0.1 * 4.0)
