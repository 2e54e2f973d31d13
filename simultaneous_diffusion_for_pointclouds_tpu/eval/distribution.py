"""Distribution-distance metrics for ``--fast_fid``: MMD and JSD over
birds-eye-view occupancy histograms.

The reference's config promises a fast-FID mode but its dispatch is broken:
``main.py:202-203`` calls ``runner.fast_fid()``, which no runner defines
(AttributeError).  The LiDARGen paper the reference forks (arXiv:2209.03954)
evaluates generated LiDAR with MMD and Jensen-Shannon divergence computed
over 2D birds-eye-view histograms of the unprojected point clouds — that
simpler, dependency-free pair is implemented here (no external feature
network needed, unlike FID/FRID), emitted as JSON by
``SimultaneousSamplingRunner.fast_fid``.

Conventions: samples are ``(C, H, W)`` float images in [0, 1]; channel 0 is
log-compressed range ``log2(d+1)/6`` (lidar_utils.py:221-232), unprojected
through the KITTI FoV grid exactly like ``eval.visualization``.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from .visualization import range_image_to_points


def bev_histogram(
    sample: np.ndarray, bins: int = 100, extent: float = 64.0
) -> np.ndarray:
    """Normalized (bins, bins) birds-eye-view occupancy histogram of one
    sample's unprojected points (x, y within ±extent metres)."""
    img = sample[0] if sample.ndim == 3 else sample
    pts = range_image_to_points(np.asarray(img, np.float32))
    if len(pts) == 0:
        return np.zeros((bins, bins), np.float64)
    hist, _, _ = np.histogram2d(
        pts[:, 0], pts[:, 1], bins=bins,
        range=[[-extent, extent], [-extent, extent]],
    )
    total = hist.sum()
    return (hist / total if total > 0 else hist).astype(np.float64)


def jsd(p: np.ndarray, q: np.ndarray, eps: float = 1e-12) -> float:
    """Jensen-Shannon divergence (base-2, in [0, 1]) between two normalized
    histograms."""
    p = np.asarray(p, np.float64).ravel()
    q = np.asarray(q, np.float64).ravel()
    p = p / max(p.sum(), eps)
    q = q / max(q.sum(), eps)
    m = 0.5 * (p + q)

    def kl(a, b):
        mask = a > 0
        return float(np.sum(a[mask] * np.log2(a[mask] / np.maximum(b[mask], eps))))

    return 0.5 * kl(p, m) + 0.5 * kl(q, m)


def mmd_squared(
    x: np.ndarray, y: np.ndarray, sigma: float | None = None
) -> float:
    """Biased (V-statistic) Gaussian-kernel MMD^2 between two sets of
    flattened histograms ``x: (n, d)``, ``y: (m, d)`` — non-negative and
    exactly 0 for identical sets (the unbiased U-statistic goes negative
    there because the x==y diagonal enters k_xy but not k_xx).
    ``sigma=None`` uses the median pairwise distance heuristic over the
    joint set."""
    x = np.asarray(x, np.float64).reshape(len(x), -1)
    y = np.asarray(y, np.float64).reshape(len(y), -1)

    def sqdist(a, b):
        aa = np.sum(a * a, axis=1)[:, None]
        bb = np.sum(b * b, axis=1)[None, :]
        return np.maximum(aa + bb - 2.0 * (a @ b.T), 0.0)

    dxx, dyy, dxy = sqdist(x, x), sqdist(y, y), sqdist(x, y)
    if sigma is None:
        joint = np.concatenate(
            [dxx[np.triu_indices(len(x), 1)], dyy[np.triu_indices(len(y), 1)],
             dxy.ravel()]
        )
        med = float(np.median(joint[joint > 0])) if np.any(joint > 0) else 1.0
        sigma = np.sqrt(0.5 * med)

    def k(d):
        return np.exp(-d / (2.0 * sigma**2))

    return float(k(dxx).mean() + k(dyy).mean() - 2.0 * k(dxy).mean())


def distribution_metrics(
    samples: Sequence[np.ndarray],
    references: Sequence[np.ndarray],
    bins: int = 100,
    extent: float = 64.0,
) -> Dict[str, float]:
    """JSD between the two sets' aggregated BEV histograms + Gaussian
    MMD^2 between the per-sample histograms.  Both ~0 for two draws of
    the same distribution; JSD -> 1 (log2) and MMD^2 >> 0 for noise vs
    data."""
    hs = np.stack([bev_histogram(s, bins, extent) for s in samples])
    hr = np.stack([bev_histogram(r, bins, extent) for r in references])
    return {
        "n_samples": int(len(hs)),
        "n_reference": int(len(hr)),
        "bev_bins": int(bins),
        "bev_extent_m": float(extent),
        "jsd": jsd(hs.mean(0), hr.mean(0)),
        "mmd2": mmd_squared(hs, hr),
    }
