"""Device mesh construction for scene/view parallelism.

The reference's only parallelism is single-process ``nn.DataParallel``
(ncsn_runner.py:55).  TPU-native replacement: a 2-D
``jax.sharding.Mesh`` with axes

- ``data``: scenes (megabatches) — embarrassingly parallel; gradients
  all-reduce over ICI.
- ``view``: the views of one scene — the cross-view consistency merge
  becomes an all-gather of the shared cloud over this axis, inserted by
  XLA from sharding annotations (no host-side backend).

Both axes ride ICI on a single slice; DCN is out of scope for parity
(SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_view: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_view
    assert n_data * n_view == len(devices), (
        f"mesh {n_data}x{n_view} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_view)
    return Mesh(arr, axis_names=("data", "view"))


def batch_sharding(mesh: Mesh, ndim: int, view_in_batch: bool = True) -> NamedSharding:
    """Sharding for (B, ...) arrays whose leading axis is scenes*views laid
    out scene-major: shard it over both mesh axes (scene blocks over
    ``data``, views within a scene over ``view``)."""
    axes = ("data", "view") if view_in_batch else ("data",)
    return NamedSharding(mesh, P(axes, *([None] * (ndim - 1))))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
