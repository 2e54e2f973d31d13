"""Curriculum trainer unit behavior (CPU, tiny shapes)."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simultaneous_diffusion_for_pointclouds_tpu.config import load_config
from simultaneous_diffusion_for_pointclouds_tpu.runners.train import CurriculumTrainer


def _trainer():
    cfg = load_config("configs/smoke.yml")
    cfg.model.ngf = 8
    cfg.model.num_classes = 4
    cfg.data.image_size = 8
    cfg.data.image_width = 16
    args = argparse.Namespace(seed=0, log_path=None, resume_training=False)
    return CurriculumTrainer(args, cfg), cfg


@pytest.mark.slow
def test_train_step_updates_params_and_ema():
    t, cfg = _trainer()
    rng = jax.random.PRNGKey(0)
    b, c, h, w = 4, 2, 8, 16
    x = jax.random.uniform(rng, (b, c, h, w))
    mask = (jax.random.uniform(jax.random.PRNGKey(1), (b, c, h, w)) > 0.5).astype(
        jnp.float32
    )
    state = t.init_state(rng, x)
    p0 = jax.tree.leaves(state["params"])[0].copy()
    new_state, x_out, loss = t.train_step(state, rng, x, x, mask, 0)
    assert np.isfinite(float(loss)) and float(loss) > 0
    p1 = jax.tree.leaves(new_state["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # EMA moved a little toward the new params (mu=0.999)
    e1 = jax.tree.leaves(new_state["ema_params"])[0]
    assert not np.allclose(np.asarray(e1), np.asarray(p1))
    d_ema = np.abs(np.asarray(e1) - np.asarray(p0)).max()
    d_par = np.abs(np.asarray(p1) - np.asarray(p0)).max()
    assert d_ema < d_par
    # known pixels of the refined image are clamped to the original
    known = np.asarray(mask) > 0
    np.testing.assert_allclose(
        np.asarray(x_out)[known], np.asarray(x)[known], atol=1e-6
    )


def test_eval_step_finite():
    t, cfg = _trainer()
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (4, 2, 8, 16))
    mask = jnp.ones_like(x)
    state = t.init_state(rng, x)
    loss, scores = t.eval_step(state["params"], rng, x, mask, 0)
    assert np.isfinite(float(loss))
    assert scores.shape == x.shape
