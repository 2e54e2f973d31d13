"""Denoising score-matching losses (reference ``LiDARGen/losses/dsm.py``).

All losses are pure functions of ``score_fn`` so they can be jitted /
grad-ed / sharded freely.  ``score_fn(x, labels) -> score`` where ``labels``
are int32 sigma indices of shape (B,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand(sigmas_b, like):
    return sigmas_b.reshape((like.shape[0],) + (1,) * (like.ndim - 1))


def anneal_dsm_score_estimation(
    score_fn, rng, samples, sigmas, labels=None, anneal_power=2.0
):
    """Plain annealed DSM (losses/dsm.py:3-18).

    Perturbs ``samples`` with noise at a random (or given) sigma level and
    regresses the score against ``-noise/sigma^2``, weighted by
    ``sigma^anneal_power``.
    """
    label_rng, noise_rng = jax.random.split(rng)
    if labels is None:
        labels = jax.random.randint(label_rng, (samples.shape[0],), 0, len(sigmas))
    used_sigmas = _expand(sigmas[labels], samples)
    noise = jax.random.normal(noise_rng, samples.shape, samples.dtype) * used_sigmas
    perturbed = samples + noise
    target = -1.0 / (used_sigmas**2) * noise
    scores = score_fn(perturbed, labels)
    target = target.reshape(target.shape[0], -1)
    scores_flat = scores.reshape(scores.shape[0], -1)
    loss = (
        0.5
        * jnp.sum((scores_flat - target) ** 2, axis=-1)
        * jnp.squeeze(used_sigmas) ** anneal_power
    )
    return jnp.mean(loss)


def anneal_dsm_score_estimation_with_mask(
    score_fn,
    perturbed_samples,
    labels,
    sigmas,
    noise,
    masks,
    anneal_power=2.0,
):
    """Masked DSM used by the simultaneous training curriculum
    (losses/dsm.py:67-119).

    The caller has already perturbed the samples (the curriculum accumulates
    noise level-by-level, ncsn_runner_kitti_simultaneous.py:176-294) and
    passes the *total* accumulated noise plus the sigma labels it
    corresponds to.  Pixels outside ``masks`` are excluded and the loss is
    rescaled by ``mask_size / num_valid`` so sparser masks aren't
    under-weighted.  Returns ``(loss, scores)`` — the runner reuses the
    scores as a Langevin gradient during training.
    """
    used_sigmas = _expand(sigmas[labels], perturbed_samples)
    target = -1.0 / (used_sigmas**2) * noise
    scores = score_fn(perturbed_samples, labels)

    masks_flat = masks.reshape(masks.shape[0], -1).astype(scores.dtype)
    scores_flat = scores.reshape(scores.shape[0], -1)
    if masks_flat.shape[-1] * 2 == scores_flat.shape[-1]:
        # Single-channel mask on a 2-channel image: tile, as the reference
        # does with ``torch.tile(masks, (1, 2))`` (losses/dsm.py:27).
        masks_flat = jnp.tile(masks_flat, (1, 2))
    target_flat = target.reshape(target.shape[0], -1)

    num_pixels = jnp.sum(masks_flat)
    loss = (
        0.5
        * (
            jnp.sum((masks_flat * (scores_flat - target_flat)) ** 2, axis=-1)
            * masks_flat.shape[-1]
            / num_pixels
        )
        * jnp.squeeze(used_sigmas) ** anneal_power
    )
    return jnp.mean(loss), scores
