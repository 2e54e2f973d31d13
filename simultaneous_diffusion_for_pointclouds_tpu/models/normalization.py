"""Normalization layers (reference ``LiDARGen/models/normalization.py``).

``InstanceNorm2dPlus`` is the one used by every shipped config
("InstanceNorm++"): instance norm plus the cross-channel-standardised
per-channel means re-injected through a learned ``alpha`` — this keeps the
mean-colour information instance norm would otherwise destroy.  Torch
numerics preserved: instance norm uses biased variance with eps=1e-5; the
mean-standardisation uses an *unbiased* variance (torch.var default).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _normal_init(mean: float, std: float):
    def init(key, shape, dtype=jnp.float32):
        import jax

        return mean + std * jax.random.normal(key, shape, dtype)

    return init


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (normalization.py:150-176). NHWC."""

    num_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = self.num_features
        alpha = self.param("alpha", _normal_init(1.0, 0.02), (c,))
        gamma = self.param("gamma", _normal_init(1.0, 0.02), (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,)) if self.bias else None

        # statistics in f32 for stability; affine math stays in the compute
        # dtype so bf16 models keep bf16 activation traffic
        xf = x.astype(jnp.float32)
        means = jnp.mean(xf, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)  # unbiased (torch.var)
        means = ((means - m) / jnp.sqrt(v + 1e-5)).astype(x.dtype)

        mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)  # biased (InstanceNorm)
        h = ((xf - mu) / jnp.sqrt(var + 1e-5)).astype(x.dtype)

        h = h + means[:, None, None, :] * alpha.astype(x.dtype)
        out = gamma.astype(x.dtype) * h
        if self.bias:
            out = out + beta.astype(x.dtype)
        return out


class InstanceNorm2d(nn.Module):
    """Plain affine instance norm (torch InstanceNorm2d(affine=True))."""

    num_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight", nn.initializers.ones, (self.num_features,))
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mu) / jnp.sqrt(var + 1e-5)
        out = gamma * h
        if self.bias:
            beta = self.param("bias", nn.initializers.zeros, (self.num_features,))
            out = out + beta
        return out


class NoneNorm2d(nn.Module):
    num_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        return x


class VarianceNorm2d(nn.Module):
    """Variance-only normalization (normalization.py: VarianceNorm2d)."""

    num_features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", _normal_init(1.0, 0.02), (self.num_features,))
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + 1e-5)
        return h * alpha


def get_normalization(name: str) -> Callable:
    """Dispatcher mirroring normalization.py:5-34 (unconditional branch)."""
    table = {
        "InstanceNorm": InstanceNorm2d,
        "InstanceNorm++": InstanceNorm2dPlus,
        "VarianceNorm": VarianceNorm2d,
        "None": NoneNorm2d,
    }
    if name not in table:
        raise NotImplementedError(f"{name} does not exist!")
    return table[name]
