"""NCSNv2 score-network family in Flax.

Re-design of ``LiDARGen/models/ncsnv2.py`` for TPU: NHWC compute internally
(inputs/outputs stay NCHW for drop-in parity with the reference's tensor
layout), circular-padded convs, and a static sigma ladder baked into the
jaxpr so ``output / sigmas[labels]`` fuses into the final conv.

Classes mirror the reference one-to-one:

- :class:`NCSNv2`         — 4-scale RefineNet (ncsnv2.py:11-101)
- :class:`NCSNv2Deeper`   — 5-scale (ncsnv2.py:104-195)
- :class:`NCSNv2Deepest`  — 6-stage encoder, 6 refine blocks (:198-299)
- :class:`NCSNLiDAR`      — Deepest + CoordConv input channels (:302-418)
- :class:`NCSNLiDARSmall` — NCSNv2 + CoordConv; the flagship (:420-518)

``sigmas`` is passed as a plain tuple of floats (static); ``labels`` select
per-sample sigmas, and the network returns score*sigma/sigma = the true
score, i.e. raw output divided by sigma (ncsnv2.py:514-516).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import cfg_get
from ..diffusion.sigmas import get_sigmas
from .layers import CircularConv, RefineBlock, ResidualBlock, ZeroPadConv, get_act
from .normalization import get_normalization

Dtype = Any


def _coord_channels(b: int, h: int, w: int, dtype) -> jnp.ndarray:
    """CoordConv xy channels (ncsnv2.py:490-496): channel 0 = x in [0,1]
    along width, channel 1 = y in [0,1] along height; NHWC layout here."""
    xs = np.linspace(0.0, 1.0, w, dtype=np.float32)
    ys = np.linspace(0.0, 1.0, h, dtype=np.float32)
    xg = np.broadcast_to(xs[None, :], (h, w))
    yg = np.broadcast_to(ys[:, None], (h, w))
    xy = np.stack([xg, yg], axis=-1)[None]  # (1, H, W, 2)
    return jnp.broadcast_to(jnp.asarray(xy, dtype), (b, h, w, 2))


class _NCSNBase(nn.Module):
    """Shared config plumbing for the family."""

    channels: int = 2
    ngf: int = 128
    num_classes: int = 232
    sigmas: Tuple[float, ...] = ()
    nonlinearity: str = "elu"
    normalization: str = "InstanceNorm++"
    logit_transform: bool = False
    rescaled: bool = False
    coord_conv: bool = False
    depth: str = "small"  # small | deeper | deepest
    dtype: Dtype = jnp.float32

    def _pre(self, x):
        """NCHW -> NHWC, input affine, optional CoordConv concat."""
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        if not self.logit_transform and not self.rescaled:
            h = 2.0 * x - 1.0
        else:
            h = x
        if self.coord_conv:
            b, hh, ww, _ = h.shape
            h = jnp.concatenate([h, _coord_channels(b, hh, ww, h.dtype)], axis=-1)
        return h

    def _post(self, out, x_nchw, labels):
        """Divide by sigma[labels], NHWC -> NCHW."""
        out = jnp.transpose(out, (0, 3, 1, 2))
        sig = jnp.asarray(self.sigmas, jnp.float32)[labels]
        sig = sig.reshape((x_nchw.shape[0],) + (1,) * (x_nchw.ndim - 1))
        return out.astype(jnp.float32) / sig

    @nn.compact
    def __call__(self, x, labels):
        act = get_act(self.nonlinearity)
        norm = get_normalization(self.normalization)
        ngf = self.ngf
        dt = self.dtype

        h = self._pre(x)
        out = ZeroPadConv(ngf, 3, dtype=dt, name="begin_conv")(h)

        def res_pair(name, cin, cout, resample=None, dilation=None):
            def run(v):
                v = ResidualBlock(
                    cin, cout, norm, act, resample=resample, dilation=dilation,
                    dtype=dt, name=f"{name}_0",
                )(v)
                v = ResidualBlock(
                    cout, cout, norm, act, resample=None, dilation=dilation,
                    dtype=dt, name=f"{name}_1",
                )(v)
                return v

            return run

        if self.depth == "small":
            layer1 = res_pair("res1", ngf, ngf)(out)
            layer2 = res_pair("res2", ngf, 2 * ngf, resample="down")(layer1)
            layer3 = res_pair("res3", 2 * ngf, 2 * ngf, resample="down", dilation=2)(layer2)
            layer4 = res_pair("res4", 2 * ngf, 2 * ngf, resample="down", dilation=4)(layer3)

            ref1 = RefineBlock(2 * ngf, 1, act, start=True, dtype=dt, name="refine1")(
                [layer4], layer4.shape[1:3]
            )
            ref2 = RefineBlock(2 * ngf, 2, act, dtype=dt, name="refine2")(
                [layer3, ref1], layer3.shape[1:3]
            )
            ref3 = RefineBlock(ngf, 2, act, dtype=dt, name="refine3")(
                [layer2, ref2], layer2.shape[1:3]
            )
            out = RefineBlock(ngf, 2, act, end=True, dtype=dt, name="refine4")(
                [layer1, ref3], layer1.shape[1:3]
            )
        elif self.depth == "deeper":
            layer1 = res_pair("res1", ngf, ngf)(out)
            layer2 = res_pair("res2", ngf, 2 * ngf, resample="down")(layer1)
            layer3 = res_pair("res3", 2 * ngf, 2 * ngf, resample="down")(layer2)
            layer4 = res_pair("res4", 2 * ngf, 4 * ngf, resample="down", dilation=2)(layer3)
            layer5 = res_pair("res5", 4 * ngf, 4 * ngf, resample="down", dilation=4)(layer4)

            ref1 = RefineBlock(4 * ngf, 1, act, start=True, dtype=dt, name="refine1")(
                [layer5], layer5.shape[1:3]
            )
            ref2 = RefineBlock(2 * ngf, 2, act, dtype=dt, name="refine2")(
                [layer4, ref1], layer4.shape[1:3]
            )
            ref3 = RefineBlock(2 * ngf, 2, act, dtype=dt, name="refine3")(
                [layer3, ref2], layer3.shape[1:3]
            )
            ref4 = RefineBlock(ngf, 2, act, dtype=dt, name="refine4")(
                [layer2, ref3], layer2.shape[1:3]
            )
            out = RefineBlock(ngf, 2, act, end=True, dtype=dt, name="refine5")(
                [layer1, ref4], layer1.shape[1:3]
            )
        elif self.depth == "deepest":
            layer1 = res_pair("res1", ngf, ngf)(out)
            layer2 = res_pair("res2", ngf, 2 * ngf, resample="down")(layer1)
            layer3 = res_pair("res3", 2 * ngf, 2 * ngf, resample="down")(layer2)
            layer31 = res_pair("res31", 2 * ngf, 2 * ngf, resample="down")(layer3)
            layer4 = res_pair("res4", 2 * ngf, 4 * ngf, resample="down", dilation=2)(layer31)
            layer5 = res_pair("res5", 4 * ngf, 4 * ngf, resample="down", dilation=4)(layer4)

            ref1 = RefineBlock(4 * ngf, 1, act, start=True, dtype=dt, name="refine1")(
                [layer5], layer5.shape[1:3]
            )
            ref2 = RefineBlock(2 * ngf, 2, act, dtype=dt, name="refine2")(
                [layer4, ref1], layer4.shape[1:3]
            )
            ref31 = RefineBlock(2 * ngf, 2, act, dtype=dt, name="refine31")(
                [layer31, ref2], layer31.shape[1:3]
            )
            ref3 = RefineBlock(2 * ngf, 2, act, dtype=dt, name="refine3")(
                [layer3, ref31], layer3.shape[1:3]
            )
            ref4 = RefineBlock(ngf, 2, act, dtype=dt, name="refine4")(
                [layer2, ref3], layer2.shape[1:3]
            )
            out = RefineBlock(ngf, 2, act, end=True, dtype=dt, name="refine5")(
                [layer1, ref4], layer1.shape[1:3]
            )
        else:
            raise ValueError(f"unknown depth {self.depth}")

        norm_cls = get_normalization(self.normalization)
        out = norm_cls(ngf, name="normalizer")(out)
        out = act(out)
        out = ZeroPadConv(self.channels, 3, dtype=dt, name="end_conv")(out)
        return self._post(out, x, labels)


def _family(name, depth, coord_conv):
    def make(config=None, *, sigmas=None, dtype=jnp.float32, **kw):
        """Construct from a reference-style config namespace or kwargs."""
        if config is not None and cfg_get(config, "model.spec_norm", False):
            raise NotImplementedError(
                "spec_norm=true is not supported (no shipped reference config "
                "enables spectral norm; see COVERAGE.md)"
            )
        if config is not None:
            sig = sigmas if sigmas is not None else tuple(
                float(s) for s in np.asarray(get_sigmas(config))
            )
            return _NCSNBase(
                channels=cfg_get(config, "data.channels", 2),
                ngf=cfg_get(config, "model.ngf", 128),
                num_classes=cfg_get(config, "model.num_classes", 232),
                sigmas=sig,
                nonlinearity=cfg_get(config, "model.nonlinearity", "elu"),
                normalization=cfg_get(config, "model.normalization", "InstanceNorm++"),
                logit_transform=cfg_get(config, "data.logit_transform", False),
                rescaled=cfg_get(config, "data.rescaled", False),
                coord_conv=coord_conv,
                depth=depth,
                dtype=dtype,
            )
        return _NCSNBase(
            sigmas=tuple(float(s) for s in np.asarray(sigmas)),
            coord_conv=coord_conv,
            depth=depth,
            dtype=dtype,
            **kw,
        )

    make.__name__ = name
    return make


NCSNv2 = _family("NCSNv2", "small", coord_conv=False)
NCSNv2Deeper = _family("NCSNv2Deeper", "deeper", coord_conv=False)
NCSNv2Deepest = _family("NCSNv2Deepest", "deepest", coord_conv=False)
NCSNLiDAR = _family("NCSNLiDAR", "deepest", coord_conv=True)
NCSNLiDARSmall = _family("NCSNLiDARSmall", "small", coord_conv=True)


def get_model(config, dtype=None):
    """Dataset-name -> architecture dispatch, mirroring the reference
    runners' ``get_model`` (ncsn_runner.py:26-33,
    ncsn_runner_kitti_simultaneous.py:33-52).

    ``dtype=None`` reads ``model.compute_dtype`` from the config
    ("float32" default; "bfloat16" halves activation HBM traffic — params
    and the output stay f32 via the models' in/out casts, so checkpoints
    are dtype-compatible either way).
    """
    if dtype is None:
        name = str(cfg_get(config, "model.compute_dtype", "float32"))
        try:
            dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]
        except KeyError:
            raise NotImplementedError(
                f"model.compute_dtype {name!r} not supported"
            ) from None
    ds = cfg_get(config, "data.dataset")
    if ds in ("CIFAR10", "CELEBA"):
        return NCSNv2(config, dtype=dtype)
    if ds == "KITTI360":
        return NCSNv2Deepest(config, dtype=dtype)
    # KITTI, lidar, every HDVMine variant, KITTI360_im_* -> LiDAR-small
    return NCSNLiDARSmall(config, dtype=dtype)
