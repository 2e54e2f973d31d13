"""Noise-level ladders (reference ``LiDARGen/models/__init__.py:5-18``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import cfg_get


def get_sigmas(config=None, *, sigma_begin=None, sigma_end=None, num_classes=None, dist=None):
    """Geometric or uniform sigma ladder.

    Accepts either a reference-style config namespace or explicit kwargs.
    Geometric: ``exp(linspace(log(sigma_begin), log(sigma_end), L))``.
    """
    if config is not None:
        sigma_begin = cfg_get(config, "model.sigma_begin")
        sigma_end = cfg_get(config, "model.sigma_end")
        num_classes = cfg_get(config, "model.num_classes")
        dist = cfg_get(config, "model.sigma_dist", "geometric")
    dist = dist or "geometric"
    if dist == "geometric":
        sigmas = np.exp(
            np.linspace(np.log(sigma_begin), np.log(sigma_end), num_classes)
        )
    elif dist == "uniform":
        sigmas = np.linspace(sigma_begin, sigma_end, num_classes)
    else:
        raise NotImplementedError("sigma distribution not supported")
    return jnp.asarray(sigmas, dtype=jnp.float32)
