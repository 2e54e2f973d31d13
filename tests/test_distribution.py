"""fast_fid distribution metrics (eval/distribution.py): ~0 for two draws
of the same distribution, large for noise vs data (VERDICT r3 #4)."""

import numpy as np

from simultaneous_diffusion_for_pointclouds_tpu.eval.distribution import (
    bev_histogram,
    distribution_metrics,
    jsd,
    mmd_squared,
)


def _structured(seed, n=6, h=32, w=256):
    """Data-like set: log-range images of a ~10 m ring with small jitter —
    BEV mass concentrates on a ring."""
    rng = np.random.default_rng(seed)
    d = 10.0 + rng.normal(0, 0.5, (n, h, w))
    img = np.log2(np.maximum(d, 0.0) + 1.0) / 6.0
    return [np.stack([im, np.zeros_like(im)]) for im in img.astype(np.float32)]


def _noise(seed, n=6, h=32, w=256):
    rng = np.random.default_rng(seed)
    return [
        rng.uniform(0, 1, (2, h, w)).astype(np.float32) for _ in range(n)
    ]


def test_identical_sets_near_zero():
    data = _structured(0)
    m = distribution_metrics(data, data, bins=50)
    assert abs(m["jsd"]) < 1e-9
    assert abs(m["mmd2"]) < 1e-6


def test_same_distribution_small_vs_noise_large():
    a, b = _structured(1), _structured(2)
    noise = _noise(3)
    same = distribution_metrics(a, b, bins=50)
    diff = distribution_metrics(a, noise, bins=50)
    assert same["jsd"] < 0.25
    assert diff["jsd"] > 4 * same["jsd"]
    assert diff["mmd2"] > 4 * max(same["mmd2"], 1e-9)


def test_jsd_bounds_and_symmetry():
    p = np.array([1.0, 0.0, 0.0])
    q = np.array([0.0, 1.0, 0.0])
    assert abs(jsd(p, q) - 1.0) < 1e-9  # disjoint -> 1 bit
    assert abs(jsd(p, p)) < 1e-12
    r = np.array([0.5, 0.25, 0.25])
    assert abs(jsd(p, r) - jsd(r, p)) < 1e-12


def test_mmd_detects_mean_shift():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (20, 8))
    y = rng.normal(0, 1, (20, 8))
    z = rng.normal(2.0, 1, (20, 8))
    assert mmd_squared(x, z) > 10 * abs(mmd_squared(x, y))


def test_bev_histogram_normalized_and_located():
    img = np.full((32, 256), np.log2(11.0) / 6.0, np.float32)  # 10 m ring
    h = bev_histogram(img, bins=64, extent=64.0)
    assert abs(h.sum() - 1.0) < 1e-9
    # mass within the ~16 m box around the origin, none at the far corners
    c = 64 // 2
    inner = h[c - 10 : c + 10, c - 10 : c + 10].sum()
    assert inner > 0.9
    assert h[0, 0] == 0
