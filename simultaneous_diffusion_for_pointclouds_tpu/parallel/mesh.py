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


def best_batch_axes(mesh: Mesh, batch: int):
    """Largest mesh-axis combination that evenly divides ``batch``.

    The ablation plan slices 2..A views out of each scene
    (runners/sample.py:_ablation_plan), so the leading batch dim varies
    between calls and is not always divisible by the full mesh; degrade
    to a single axis, or to replication, rather than failing the jit.
    Returns a PartitionSpec leading entry (or None for replication).
    """
    nd, nv = mesh.shape["data"], mesh.shape["view"]
    if batch % (nd * nv) == 0:
        return ("data", "view")
    if nd > 1 and batch % nd == 0:
        return ("data",)
    if nv > 1 and batch % nv == 0:
        return ("view",)
    return None


def batch_sharding_for(mesh: Mesh, batch: int, ndim: int) -> NamedSharding:
    """Batch sharding with graceful divisibility fallback (see
    :func:`best_batch_axes`)."""
    axes = best_batch_axes(mesh, batch)
    if axes is None:
        return replicate_sharding(mesh)
    return NamedSharding(mesh, P(axes, *([None] * (ndim - 1))))


def maybe_mesh(config, min_devices: int = 2) -> Optional[Mesh]:
    """Build the production (data, view) mesh from config, or None.

    ``parallel.enable``: true / false / "auto" (default).  "auto" engages
    whenever more than one device is visible — the multi-chip path is the
    default code path, mirroring the reference wrapping every model in
    ``nn.DataParallel`` (ncsn_runner.py:55).  ``parallel.n_view`` sets the
    view-axis extent (default 1 = pure scene/data parallelism);
    ``parallel.n_data`` optionally caps the data axis.
    """
    # local import so config helpers stay importable without this package
    from ..config import cfg_get

    enable = cfg_get(config, "parallel.enable", "auto")
    if enable in (False, "false", "off", 0):
        return None
    devices = jax.devices()
    if enable == "auto" and len(devices) < min_devices:
        return None
    n_view = int(cfg_get(config, "parallel.n_view", 1))
    n_data = cfg_get(config, "parallel.n_data", None)
    if n_data is None:
        n_data = max(1, len(devices) // n_view)
    n_data = int(n_data)
    if n_data * n_view > len(devices):
        raise ValueError(
            f"parallel: mesh {n_data}x{n_view} needs {n_data * n_view} devices, "
            f"have {len(devices)}"
        )
    if n_data * n_view == 1:
        return None
    return make_mesh(n_data=n_data, n_view=n_view, devices=devices[: n_data * n_view])
