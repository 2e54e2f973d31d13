"""Data-space transforms (reference ``LiDARGen/datasets/__init__.py:186-215``).

With the shipped configs every flag is false, so these reduce to identity on
the forward path and clamp-[0,1] on the inverse — but the full knob set is
kept for config compatibility.  Implemented for jnp/numpy arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import cfg_get


def logit_transform(image, lam=1e-6):
    image = lam + (1 - 2 * lam) * image
    return jnp.log(image) - jnp.log1p(-image)


def data_transform(config, x, rng=None):
    if cfg_get(config, "data.uniform_dequantization", False):
        assert rng is not None, "uniform_dequantization needs an rng"
        x = x / 256.0 * 255.0 + jax.random.uniform(rng, x.shape, x.dtype) / 256.0
    if cfg_get(config, "data.gaussian_dequantization", False):
        assert rng is not None, "gaussian_dequantization needs an rng"
        x = x + jax.random.normal(rng, x.shape, x.dtype) * 0.01

    if cfg_get(config, "data.rescaled", False):
        x = 2 * x - 1.0
    elif cfg_get(config, "data.logit_transform", False):
        x = logit_transform(x)

    image_mean = cfg_get(config, "image_mean", None)
    if image_mean is not None:
        x = x - jnp.asarray(image_mean)[None, ...]
    return x


def inverse_data_transform(config, x):
    image_mean = cfg_get(config, "image_mean", None)
    if image_mean is not None:
        x = x + jnp.asarray(image_mean)[None, ...]

    if cfg_get(config, "data.logit_transform", False):
        x = jax.nn.sigmoid(x)
    elif cfg_get(config, "data.rescaled", False):
        x = (x + 1.0) / 2.0

    return jnp.clip(x, 0.0, 1.0)
