"""Legacy NCSN (v1): sigma-conditional RefineNet.

Re-design of ``models/ncsn.py`` + the conditional twins in
``models/layers.py:86-398`` and ``models/normalization.py:179-208``: the
same 4-scale RefineNet as NCSNv2, but every normalization is a
class-conditional InstanceNorm++ with an ``nn.Embed(num_classes, 3C)``
per-sigma affine, threaded through conditional CRP/RCU/MSF/Refine blocks.
Unlike NCSNv2 the output is NOT divided by sigma (v1 predicts the raw
score).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import cfg_get
from .layers import (
    CircularConv,
    ConvMeanPool,
    ZeroPadConv,
    avg_pool_5x5,
    bilinear_resize_align_corners,
    conv1x1,
    get_act,
)
Dtype = Any


class ConditionalInstanceNorm2dPlus(nn.Module):
    """normalization.py:179-208: InstanceNorm++ with per-class affine from
    an embedding table ((gamma, alpha, beta) chunks)."""

    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = self.num_features
        n_out = 3 * c if self.bias else 2 * c

        def embed_init(key, shape, dtype=jnp.float32):
            import jax

            w = jax.random.normal(key, shape, dtype) * 0.02 + 1.0
            if self.bias:
                w = w.at[:, 2 * c :].set(0.0)
            return w

        table = self.param("embedding", embed_init, (self.num_classes, n_out))
        emb = table[y]  # (B, n_out)

        xf = x.astype(jnp.float32)
        means = jnp.mean(xf, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
        means = ((means - m) / jnp.sqrt(v + 1e-5)).astype(x.dtype)
        mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        h = ((xf - mu) / jnp.sqrt(var + 1e-5)).astype(x.dtype)

        if self.bias:
            gamma, alpha, beta = emb[:, :c], emb[:, c : 2 * c], emb[:, 2 * c :]
        else:
            gamma, alpha = emb[:, :c], emb[:, c:]
            beta = None
        h = h + means[:, None, None, :] * alpha[:, None, None, :].astype(x.dtype)
        out = gamma[:, None, None, :].astype(x.dtype) * h
        if beta is not None:
            out = out + beta[:, None, None, :].astype(x.dtype)
        return out


class CondCRPBlock(nn.Module):
    """layers.py:86-109 (note: uses AvgPool, not MaxPool)."""

    features: int
    n_stages: int
    num_classes: int
    act: Callable
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = ConditionalInstanceNorm2dPlus(
                path.shape[-1], self.num_classes, name=f"norms_{i}"
            )(path, y)
            path = avg_pool_5x5(path)
            path = CircularConv(
                self.features, 3, use_bias=False, dtype=self.dtype, name=f"convs_{i}"
            )(path)
            x = path + x
        return x


class CondRCUBlock(nn.Module):
    """layers.py:137-162."""

    features: int
    n_blocks: int
    n_stages: int
    num_classes: int
    act: Callable
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = ConditionalInstanceNorm2dPlus(
                    x.shape[-1], self.num_classes, name=f"{i + 1}_{j + 1}_norm"
                )(x, y)
                x = self.act(x)
                x = CircularConv(
                    self.features, 3, use_bias=False, dtype=self.dtype,
                    name=f"{i + 1}_{j + 1}_conv",
                )(x)
            x = x + residual
        return x


class CondMSFBlock(nn.Module):
    """layers.py:187-211."""

    features: int
    n_inputs: int
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, y, shape):
        total = None
        for i, xi in enumerate(xs):
            h = ConditionalInstanceNorm2dPlus(
                xi.shape[-1], self.num_classes, name=f"norms_{i}"
            )(xi, y)
            h = CircularConv(
                self.features, 3, use_bias=True, dtype=self.dtype, name=f"convs_{i}"
            )(h)
            h = bilinear_resize_align_corners(h, shape)
            total = h if total is None else total + h
        return total


class CondRefineBlock(nn.Module):
    """layers.py:253-288."""

    features: int
    n_inputs: int
    num_classes: int
    act: Callable
    start: bool = False
    end: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, y, output_shape):
        hs = [
            CondRCUBlock(
                xi.shape[-1], 2, 2, self.num_classes, self.act, dtype=self.dtype,
                name=f"adapt_convs_{i}",
            )(xi, y)
            for i, xi in enumerate(xs)
        ]
        if self.n_inputs > 1:
            h = CondMSFBlock(
                self.features, self.n_inputs, self.num_classes, dtype=self.dtype,
                name="msf",
            )(hs, y, output_shape)
        else:
            h = hs[0]
        h = CondCRPBlock(
            self.features, 2, self.num_classes, self.act, dtype=self.dtype, name="crp"
        )(h, y)
        h = CondRCUBlock(
            self.features, 3 if self.end else 1, 2, self.num_classes, self.act,
            dtype=self.dtype, name="output_convs",
        )(h, y)
        return h


class ConditionalResidualBlock(nn.Module):
    """layers.py:344-398."""

    input_dim: int
    output_dim: int
    num_classes: int
    act: Callable
    resample: str | None = None
    dilation: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        norm = lambda c, name: ConditionalInstanceNorm2dPlus(
            c, self.num_classes, name=name
        )
        h = norm(self.input_dim, "normalize1")(x, y)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation is not None:
                h = CircularConv(self.input_dim, 3, dilation=self.dilation, dtype=self.dtype, name="conv1")(h)
                h = norm(self.input_dim, "normalize2")(h, y)
                h = self.act(h)
                h = CircularConv(self.output_dim, 3, dilation=self.dilation, dtype=self.dtype, name="conv2")(h)
                shortcut = CircularConv(self.output_dim, 3, dilation=self.dilation, dtype=self.dtype, name="shortcut")(x)
            else:
                h = CircularConv(self.input_dim, 3, dtype=self.dtype, name="conv1")(h)
                h = norm(self.input_dim, "normalize2")(h, y)
                h = self.act(h)
                h = ConvMeanPool(self.output_dim, 3, dtype=self.dtype, name="conv2")(h)
                shortcut = ConvMeanPool(self.output_dim, 1, dtype=self.dtype, name="shortcut")(x)
        else:
            if self.dilation is not None:
                h = CircularConv(self.output_dim, 3, dilation=self.dilation, dtype=self.dtype, name="conv1")(h)
                h = norm(self.output_dim, "normalize2")(h, y)
                h = self.act(h)
                h = CircularConv(self.output_dim, 3, dilation=self.dilation, dtype=self.dtype, name="conv2")(h)
                shortcut = (
                    CircularConv(self.output_dim, 3, dilation=self.dilation, dtype=self.dtype, name="shortcut")(x)
                    if self.output_dim != self.input_dim
                    else x
                )
            else:
                h = CircularConv(self.output_dim, 3, dtype=self.dtype, name="conv1")(h)
                h = norm(self.output_dim, "normalize2")(h, y)
                h = self.act(h)
                h = CircularConv(self.output_dim, 3, dtype=self.dtype, name="conv2")(h)
                shortcut = (
                    conv1x1(self.output_dim, dtype=self.dtype, name="shortcut")(x)
                    if self.output_dim != self.input_dim
                    else x
                )
        return shortcut + h


class NCSN(nn.Module):
    """Legacy conditional NCSN (models/ncsn.py:9-188)."""

    channels: int = 2
    ngf: int = 128
    num_classes: int = 232
    nonlinearity: str = "elu"
    logit_transform: bool = False
    rescaled: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        act = get_act(self.nonlinearity)
        ngf, nc = self.ngf, self.num_classes
        dt = self.dtype

        h = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)
        if not self.logit_transform and not self.rescaled:
            h = 2.0 * h - 1.0

        out = ZeroPadConv(ngf, 3, dtype=dt, name="begin_conv")(h)

        def pair(name, cin, cout, resample=None, dilation=None):
            def run(v):
                v = ConditionalResidualBlock(
                    cin, cout, nc, act, resample=resample, dilation=dilation,
                    dtype=dt, name=f"{name}_0",
                )(v, y)
                v = ConditionalResidualBlock(
                    cout, cout, nc, act, resample=None, dilation=dilation,
                    dtype=dt, name=f"{name}_1",
                )(v, y)
                return v

            return run

        layer1 = pair("res1", ngf, ngf)(out)
        layer2 = pair("res2", ngf, 2 * ngf, resample="down")(layer1)
        layer3 = pair("res3", 2 * ngf, 2 * ngf, resample="down", dilation=2)(layer2)
        layer4 = pair("res4", 2 * ngf, 2 * ngf, resample="down", dilation=4)(layer3)

        ref1 = CondRefineBlock(2 * ngf, 1, nc, act, start=True, dtype=dt, name="refine1")(
            [layer4], y, layer4.shape[1:3]
        )
        ref2 = CondRefineBlock(2 * ngf, 2, nc, act, dtype=dt, name="refine2")(
            [layer3, ref1], y, layer3.shape[1:3]
        )
        ref3 = CondRefineBlock(ngf, 2, nc, act, dtype=dt, name="refine3")(
            [layer2, ref2], y, layer2.shape[1:3]
        )
        out = CondRefineBlock(ngf, 2, nc, act, end=True, dtype=dt, name="refine4")(
            [layer1, ref3], y, layer1.shape[1:3]
        )

        out = ConditionalInstanceNorm2dPlus(ngf, nc, name="normalizer")(out, y)
        out = act(out)
        out = ZeroPadConv(self.channels, 3, dtype=dt, name="end_conv")(out)
        return jnp.transpose(out, (0, 3, 1, 2)).astype(jnp.float32)


def ncsn_from_config(config, dtype=jnp.float32) -> NCSN:
    return NCSN(
        channels=cfg_get(config, "data.channels", 2),
        ngf=cfg_get(config, "model.ngf", 128),
        num_classes=cfg_get(config, "model.num_classes", 232),
        nonlinearity=cfg_get(config, "model.nonlinearity", "elu"),
        logit_transform=cfg_get(config, "data.logit_transform", False),
        rescaled=cfg_get(config, "data.rescaled", False),
        dtype=dtype,
    )
