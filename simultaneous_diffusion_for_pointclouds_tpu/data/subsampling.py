"""Grid subsampling: native C++ extension with a pure-numpy fallback.

Wraps the ``grid_subsampling`` CPython extension (built from
``native/``) behind the reference's helper signature
(kitti360_im_SceneCompletion.py:16-34 ``grid_sub_sampling``).  When the
extension is not built, a vectorised numpy implementation with identical
semantics (voxel-hash barycenters, per-voxel label majority) is used.
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import numpy as np

_NATIVE = None


def _native():
    global _NATIVE
    if _NATIVE is None:
        native_dir = os.path.join(os.path.dirname(__file__), "..", "native")
        if native_dir not in sys.path:
            sys.path.insert(0, os.path.abspath(native_dir))
        try:
            import grid_subsampling  # type: ignore

            _NATIVE = grid_subsampling
        except ImportError:
            _NATIVE = False
    return _NATIVE


def _numpy_grid_subsample(points, features, labels, voxel):
    pts = np.asarray(points, np.float64)
    origin = np.floor(pts.min(axis=0) / voxel) * voxel
    rel = np.floor((pts - origin) / voxel).astype(np.int64)
    nx = rel[:, 0].max() + 1
    ny = rel[:, 1].max() + 1
    keys = rel[:, 0] + nx * rel[:, 1] + nx * ny * rel[:, 2]
    uniq, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)

    def mean_by_voxel(vals):
        out = np.zeros((len(uniq), vals.shape[1]))
        np.add.at(out, inv, vals)
        return out / counts[:, None]

    sub_points = mean_by_voxel(pts).astype(np.float32)
    sub_features = None
    if features is not None:
        f = np.asarray(features, np.float64).reshape(len(pts), -1)
        sub_features = mean_by_voxel(f).astype(np.float32)
    sub_labels = None
    if labels is not None:
        l = np.asarray(labels, np.int32).reshape(len(pts), -1)
        sub_labels = np.zeros((len(uniq), l.shape[1]), np.int32)
        for col in range(l.shape[1]):
            # per-voxel majority vote
            order = np.argsort(inv, kind="stable")
            vox = inv[order]
            vals = l[order, col]
            for i, u in enumerate(range(len(uniq))):
                seg = vals[vox == u]
                v, c = np.unique(seg, return_counts=True)
                sub_labels[i, col] = v[np.argmax(c)]
    return sub_points, sub_features, sub_labels


def grid_sub_sampling(
    points: np.ndarray,
    features: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
    sampleDl: float = 0.1,
    verbose: int = 0,
):
    """Reference-compatible helper: returns the same tuple arity as the
    inputs provided (points[, features][, labels])."""
    native = _native()
    if native:
        kwargs = dict(sampleDl=float(sampleDl), verbose=int(verbose))
        if features is not None:
            kwargs["features"] = np.ascontiguousarray(features, np.float32)
        if labels is not None:
            kwargs["classes"] = np.ascontiguousarray(labels, np.int32)
        return native.compute(np.ascontiguousarray(points[:, :3], np.float32), **kwargs)

    sub_p, sub_f, sub_l = _numpy_grid_subsample(points[:, :3], features, labels, sampleDl)
    if features is not None and labels is not None:
        return sub_p, sub_f, sub_l
    if features is not None:
        return sub_p, sub_f
    if labels is not None:
        return sub_p, sub_l
    return sub_p
