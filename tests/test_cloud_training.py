"""Shared-cloud 3D-noise training curriculum (diffusion/cloud_training.py,
runners ThreeDNoiseTrainer) — the debugged re-design of the reference's
experimental NCSNRunnerSimultaneous.train (ncsn_runner_simultaneous.py:73-560,
undispatched + NameErrors in the original)."""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simultaneous_diffusion_for_pointclouds_tpu.diffusion.cloud_training import (
    TRAINER_MODIFICATIONS,
    TrainerGrid,
    advance_prior_cloud,
    init_cloud_carry,
    project_trainer,
    three_d_training_images,
    unproject_trainer,
)

B, H, W = 4, 8, 16


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, 0.9, (B, 2, H, W)).astype(np.float32)
    mask1 = (rng.uniform(size=(B, 1, H, W)) > 0.4).astype(np.float32)
    mask = np.concatenate([mask1, mask1], axis=1)
    return jnp.asarray(x), jnp.asarray(mask)


def test_trainer_grid_matches_reference_constants():
    import math

    g = TrainerGrid(800, 3600)  # the mining image shape the comments cite
    assert g.h_res == pytest.approx(math.radians(360) / 3600)
    assert g.v_res == pytest.approx(math.radians(60) / 800)
    # verticalMin = rowCount*3//(-4) * vRes + vRes/2  (-45 deg row 0)
    assert g.v_min == pytest.approx((800 * 3 // -4) * g.v_res + g.v_res / 2)


def test_project_unproject_roundtrip():
    g = TrainerGrid(H, W)
    depth = jnp.asarray(np.random.default_rng(0).uniform(1, 50, (1, H, W)), jnp.float32)
    pts = unproject_trainer(depth, g)
    row, col, d = project_trainer(pts, g)
    np.testing.assert_allclose(np.asarray(d), np.asarray(depth), rtol=1e-5)
    rows = np.broadcast_to(np.arange(H)[None, :, None], (1, H, W))
    cols = np.broadcast_to(np.arange(W)[None, None, :], (1, H, W))
    assert (np.asarray(row) == rows).mean() > 0.99
    assert (np.asarray(col) == cols).mean() > 0.99


def test_training_images_composition():
    """Forward-covered pixels come from the noised clean cloud; the loss
    mask is exactly the forward coverage; DSM noise is zero off-mask."""
    x, mask = _inputs()
    g = TrainerGrid(H, W)
    origins = jnp.asarray(TRAINER_MODIFICATIONS[:B], jnp.float32) * 50.0
    sigmas = jnp.asarray([0.5, 0.1], jnp.float32)
    carry = init_cloud_carry(jax.random.PRNGKey(0), x, mask, g, origins, sigmas[0])

    images, dsm_noise, loss_mask, slot_img, fwd = three_d_training_images(
        jax.random.PRNGKey(1), x, mask, carry, 0, sigmas, g, origins
    )
    assert images.shape == (B, 2, H, W)
    assert np.isfinite(np.asarray(images)).all()
    lm = np.asarray(loss_mask)[:, 0]
    assert 0 < lm.mean() < 1  # some pixels covered, some not
    # off-mask DSM noise is exactly zero
    noise = np.asarray(dsm_noise)
    assert (noise[:, 0][lm == 0] == 0).all()
    # forward-covered pixels carry slots < B*H*W (clean pixel ids)
    slots = np.asarray(slot_img)
    assert (slots[lm > 0] >= 0).all() and (slots[lm > 0] < B * H * W).all()
    # every image pixel is filled (forward, prior, or previous images)
    assert (np.asarray(images)[:, 0] != 0).mean() > 0.9


def test_advance_prior_cloud_moves_points():
    x, mask = _inputs(1)
    g = TrainerGrid(H, W)
    origins = jnp.asarray(TRAINER_MODIFICATIONS[:B], jnp.float32) * 50.0
    sigmas = jnp.asarray([0.5, 0.1], jnp.float32)
    carry = init_cloud_carry(jax.random.PRNGKey(0), x, mask, g, origins, sigmas[0])
    images, dsm_noise, loss_mask, slot_img, fwd = three_d_training_images(
        jax.random.PRNGKey(1), x, mask, carry, 0, sigmas, g, origins
    )
    scores = 0.1 * jnp.ones((B, 2, H, W), jnp.float32)
    new_carry = advance_prior_cloud(
        scores, images, loss_mask, slot_img, fwd, carry, g, origins
    )
    assert new_carry["cloud"].shape == carry["cloud"].shape
    assert bool(new_carry["valid"].any())
    assert np.isfinite(np.asarray(new_carry["cloud"])).all()
    # covered slots received grad sums -> differ from both base clouds
    moved = np.asarray(new_carry["cloud"]) - np.asarray(carry["cloud"])
    assert np.abs(moved).max() > 0
    np.testing.assert_array_equal(
        np.asarray(new_carry["updated"]), np.asarray(images)
    )


def test_three_d_trainer_steps_and_loss_finite():
    from simultaneous_diffusion_for_pointclouds_tpu.runners import (
        ThreeDNoiseTrainer,
        trainer_for,
    )

    ns = argparse.Namespace
    config = ns(
        data=ns(dataset="synthetic", channels=2, image_size=H, image_width=W,
                logit_transform=False, rescaled=False, num_workers=0,
                synthetic_frames=8, synthetic_points=2000,
                modifications=None),
        model=ns(sigma_begin=5.0, sigma_end=0.01, num_classes=3,
                 sigma_dist="geometric", normalization="InstanceNorm++",
                 nonlinearity="elu", ngf=8, ema=True, ema_rate=0.999),
        training=ns(algo="simultaneous_3d", batch_size=B, n_epochs=1,
                    n_iters=2, snapshot_freq=1000, anneal_power=2.0),
        sampling=ns(actualBatchSize=B, batch_size=B, n_steps_each=1,
                    step_lr=6.2e-6, denoise=True),
        optim=ns(optimizer="Adam", lr=1e-4, beta1=0.9, eps=1e-8,
                 weight_decay=0.0),
        test=ns(begin_ckpt=0, end_ckpt=0, batch_size=B),
    )
    args = ns(seed=0, log_path=None, resume_training=False)
    trainer = trainer_for(args, config)
    assert type(trainer) is ThreeDNoiseTrainer

    x, mask = _inputs(2)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, x)
    carry = init_cloud_carry(
        rng, x, mask, trainer.grid3d, trainer.mods3d * trainer.sigmas[0],
        trainer.sigmas[0],
    )
    losses = []
    for t in range(2):
        state, carry, loss = trainer.train3d_step(state, jax.random.PRNGKey(t), x, mask, carry, 0)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[0] > 0
