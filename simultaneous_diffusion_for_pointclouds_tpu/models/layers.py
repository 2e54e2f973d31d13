"""RefineNet building blocks in Flax (NHWC internally).

Functional re-design of the reference blocks (``LiDARGen/models/layers.py``):
``CRPBlock``/``RCUBlock``/``MSFBlock``/``RefineBlock``/``ResidualBlock``/
``ConvMeanPool``, with torch-compatible semantics:

- All 3x3 convs use **circular** padding on BOTH axes (the 1024-wide azimuth
  panorama wraps; torch ``padding_mode="circular"`` also wraps vertically) —
  reference layers.py:37-60.
- ``MSFBlock`` upsampling is bilinear with ``align_corners=True``
  (layers.py:182), implemented here as two small dense interpolation
  matmuls so it rides the MXU instead of a gather.
- ``ConvMeanPool`` uses a zero-padded conv then 2x2 mean pooling
  (layers.py:291-313).
- Max pooling is 5x5/stride-1 with -inf padding (layers.py:70).

Module/parameter names intentionally mirror the torch attribute names so
pretrained reference checkpoints can be converted mechanically
(see utils/torch_convert.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def get_act(nonlinearity: str) -> Callable:
    name = nonlinearity.lower()
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return functools.partial(jax.nn.leaky_relu, negative_slope=0.2)
    if name == "swish":
        return jax.nn.swish
    raise NotImplementedError("activation function does not exist!")


def circular_pad_2d(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """Wrap-pad an NHWC tensor on H and W (torch circular padding)."""
    if pad_h:
        x = jnp.concatenate([x[:, -pad_h:, :, :], x, x[:, :pad_h, :, :]], axis=1)
    if pad_w:
        x = jnp.concatenate([x[:, :, -pad_w:, :], x, x[:, :, :pad_w, :]], axis=2)
    return x


class CircularConv(nn.Module):
    """Conv2d with torch-style circular padding (both spatial axes)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    pad: int | None = None  # defaults to the torch value: dilation*(k//2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.pad if self.pad is not None else self.dilation * (self.kernel_size // 2)
        x = circular_pad_2d(x, pad, pad)
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class ZeroPadConv(nn.Module):
    """Conv2d with ordinary zero padding (reference begin/end convs and
    ConvMeanPool use default torch padding, not circular)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


def conv1x1(features, use_bias=True, dtype=jnp.float32, name=None):
    return nn.Conv(features, (1, 1), padding="VALID", use_bias=use_bias, dtype=dtype, name=name)


def _interp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Dense 1-D bilinear interpolation matrix with align_corners=True."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    if n_out == 1:
        m[0, 0] = 1.0
        return m
    scale = (n_in - 1) / (n_out - 1)
    coords = np.arange(n_out) * scale
    lo = np.clip(np.floor(coords).astype(int), 0, n_in - 1)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (coords - lo).astype(np.float32)
    np.add.at(m, (np.arange(n_out), lo), 1.0 - w)
    np.add.at(m, (np.arange(n_out), hi), w)
    return m


def bilinear_resize_align_corners(x: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize matching ``F.interpolate(align_corners=True)``.

    Separable: two small matmuls (MXU-friendly) instead of gathers.
    """
    h_out, w_out = shape
    b, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_interp_matrix(h_out, h_in), x.dtype)
    mw = jnp.asarray(_interp_matrix(w_out, w_in), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    x = jnp.einsum("pw,bhwc->bhpc", mw, x)
    return x


def max_pool_5x5(x):
    return nn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))


def avg_pool_5x5(x):
    # torch AvgPool2d(count_include_pad=True) semantics == flax avg_pool
    return nn.avg_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))


def mean_pool_2x2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ConvMeanPool(nn.Module):
    """Zero-padded conv followed by 2x2 mean pool (layers.py:291-313)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ZeroPadConv(
            self.features, self.kernel_size, use_bias=self.use_bias, dtype=self.dtype, name="conv"
        )(x)
        return mean_pool_2x2(x)


class MeanPoolConv(nn.Module):
    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = mean_pool_2x2(x)
        return ZeroPadConv(
            self.features, self.kernel_size, use_bias=self.use_bias, dtype=self.dtype, name="conv"
        )(x)


class UpsampleConv(nn.Module):
    """Nearest 2x upsample (4x channel concat + pixel shuffle) then circular
    conv (layers.py:329-341)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # concat([x]*4, channel) + PixelShuffle(2) == nearest-neighbour 2x
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return CircularConv(
            self.features, self.kernel_size, use_bias=self.use_bias, dtype=self.dtype, name="conv"
        )(x)


class CRPBlock(nn.Module):
    """Chained-residual pooling: repeated 5x5 pool + circular conv, summed
    into a running path (layers.py:62-83)."""

    features: int
    n_stages: int
    act: Callable
    maxpool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        pool = max_pool_5x5 if self.maxpool else avg_pool_5x5
        path = x
        for i in range(self.n_stages):
            path = pool(path)
            path = CircularConv(
                self.features, 3, use_bias=False, dtype=self.dtype, name=f"convs_{i}"
            )(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units: n_blocks x (n_stages x (act, conv)) + skip
    (layers.py:112-134)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Callable
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = CircularConv(
                    self.features, 3, use_bias=False, dtype=self.dtype,
                    name=f"{i + 1}_{j + 1}_conv",
                )(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion: per-input circular conv, bilinear(align_corners)
    resize to a target shape, then sum (layers.py:165-184)."""

    features: int
    n_inputs: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], shape: Tuple[int, int]):
        assert len(xs) == self.n_inputs
        total = None
        for i, xi in enumerate(xs):
            h = CircularConv(
                self.features, 3, use_bias=True, dtype=self.dtype, name=f"convs_{i}"
            )(xi)
            h = bilinear_resize_align_corners(h, shape)
            total = h if total is None else total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block: RCU adapters -> MSF -> CRP -> output RCU
    (layers.py:214-249)."""

    features: int
    n_inputs: int
    act: Callable
    start: bool = False
    end: bool = False
    maxpool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], output_shape: Tuple[int, int]):
        assert len(xs) == self.n_inputs
        hs = []
        for i, xi in enumerate(xs):
            hs.append(
                RCUBlock(
                    xi.shape[-1], 2, 2, self.act, dtype=self.dtype, name=f"adapt_convs_{i}"
                )(xi)
            )
        if self.n_inputs > 1:
            h = MSFBlock(self.features, self.n_inputs, dtype=self.dtype, name="msf")(
                hs, output_shape
            )
        else:
            h = hs[0]
        h = CRPBlock(
            self.features, 2, self.act, maxpool=self.maxpool, dtype=self.dtype, name="crp"
        )(h)
        h = RCUBlock(
            self.features, 3 if self.end else 1, 2, self.act, dtype=self.dtype,
            name="output_convs",
        )(h)
        return h


class ResidualBlock(nn.Module):
    """Pre-activation residual block (layers.py:401-456).

    ``resample='down'`` without dilation halves H,W via ConvMeanPool; with a
    dilation it is a plain dilated block (the reference's dilated 'down'
    blocks do NOT change resolution — stride is 1 everywhere).
    """

    input_dim: int
    output_dim: int
    normalization: Callable  # module factory: normalization(features, name=...)
    act: Callable
    resample: str | None = None
    dilation: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm1 = self.normalization(self.input_dim, name="normalize1")
        h = norm1(x)
        h = self.act(h)

        if self.resample == "down":
            if self.dilation is not None:
                h = CircularConv(
                    self.input_dim, 3, dilation=self.dilation, dtype=self.dtype, name="conv1"
                )(h)
                h = self.normalization(self.input_dim, name="normalize2")(h)
                h = self.act(h)
                h = CircularConv(
                    self.output_dim, 3, dilation=self.dilation, dtype=self.dtype, name="conv2"
                )(h)
                shortcut = CircularConv(
                    self.output_dim, 3, dilation=self.dilation, dtype=self.dtype, name="shortcut"
                )(x)
            else:
                h = CircularConv(self.input_dim, 3, dtype=self.dtype, name="conv1")(h)
                h = self.normalization(self.input_dim, name="normalize2")(h)
                h = self.act(h)
                h = ConvMeanPool(self.output_dim, 3, dtype=self.dtype, name="conv2")(h)
                shortcut = ConvMeanPool(self.output_dim, 1, dtype=self.dtype, name="shortcut")(x)
        elif self.resample is None:
            if self.dilation is not None:
                h = CircularConv(
                    self.output_dim, 3, dilation=self.dilation, dtype=self.dtype, name="conv1"
                )(h)
                h = self.normalization(self.output_dim, name="normalize2")(h)
                h = self.act(h)
                h = CircularConv(
                    self.output_dim, 3, dilation=self.dilation, dtype=self.dtype, name="conv2"
                )(h)
                if self.output_dim != self.input_dim:
                    shortcut = CircularConv(
                        self.output_dim, 3, dilation=self.dilation, dtype=self.dtype,
                        name="shortcut",
                    )(x)
                else:
                    shortcut = x
            else:
                h = CircularConv(self.output_dim, 3, dtype=self.dtype, name="conv1")(h)
                h = self.normalization(self.output_dim, name="normalize2")(h)
                h = self.act(h)
                h = CircularConv(self.output_dim, 3, dtype=self.dtype, name="conv2")(h)
                if self.output_dim != self.input_dim:
                    shortcut = conv1x1(self.output_dim, dtype=self.dtype, name="shortcut")(x)
                else:
                    shortcut = x
        else:
            raise ValueError("invalid resample value")

        return shortcut + h
