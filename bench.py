#!/usr/bin/env python
"""Benchmark: Langevin steps/sec/chip at 8-view 2x64x1024 (flagship shape).

Measures the fused simultaneous sampler (one jitted lax.scan program:
score forward + cross-view consistency every step) against a
"reference-execution-style" baseline run on the SAME chip: per-level /
per-step host loop with separate dispatches and a serialized per-view
consistency merge — the launch structure of the reference CUDA
implementation (models/KITTISampling.py: python loop over 42 views of
sort/unique/scatter per Langevin step).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"} where
value = fused Langevin steps/sec/chip and vs_baseline = fused/serialized
speedup.  Extra keys report the 21-image (3 scenes x 7 views) shape from
BASELINE.md's north-star and the estimated wall-clock for a full
232-level x 5-step scan set at that shape.

The baseline is the reference's LAUNCH STRUCTURE re-enacted on the SAME
chip (per-dispatch host loop, serialized per-view merges) — NOT a measured
CUDA number; no cross-hardware claim is made (see README).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

VIEWS = 8
H, W = 64, 1024
LEVELS = 20  # timing subset of the 232-level ladder
N_STEPS = 5
NGF = 128


def _config():
    ns = argparse.Namespace
    return ns(
        data=ns(dataset="KITTI360_im_8batch", channels=2, image_size=H,
                image_width=W, logit_transform=False, rescaled=False),
        model=ns(sigma_begin=50.0, sigma_end=0.01, num_classes=232,
                 sigma_dist="geometric", normalization="InstanceNorm++",
                 nonlinearity="elu", ngf=NGF,
                 # production sampling dtype: bf16 trunk, f32 params/output
                 # (quality-validated on the trained flagship model —
                 # PERF_NOTES round-4 bf16 table; both the fused and the
                 # serialized-baseline path use the same model, so
                 # vs_baseline stays structural)
                 compute_dtype="bfloat16"),
    )


def main():
    import jax
    import jax.numpy as jnp

    from simultaneous_diffusion_for_pointclouds_tpu.diffusion.consistency import (
        ConsistencyConfig,
    )
    from simultaneous_diffusion_for_pointclouds_tpu.diffusion.langevin import (
        LangevinConfig,
        simultaneous_inpainting_sample,
    )
    from simultaneous_diffusion_for_pointclouds_tpu.diffusion.sigmas import get_sigmas
    from simultaneous_diffusion_for_pointclouds_tpu.models import get_model
    from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import (
        kitti_sampler_grid,
    )
    from simultaneous_diffusion_for_pointclouds_tpu.ops.scatter import zbuffer_stats
    from simultaneous_diffusion_for_pointclouds_tpu.diffusion import consistency as cz

    config = _config()
    model = get_model(config)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (VIEWS, 2, H, W), jnp.float32)
    labels0 = jnp.zeros((VIEWS,), jnp.int32)
    params = model.init(rng, x0, labels0)["params"]

    full_sigmas = np.asarray(get_sigmas(config))
    sigmas = jnp.asarray(full_sigmas[:: len(full_sigmas) // LEVELS][:LEVELS])
    grid = kitti_sampler_grid(H, W)

    refer = x0
    mask = (jax.random.uniform(jax.random.PRNGKey(1), (VIEWS, 2, H, W)) > 0.5).astype(jnp.float32)
    sky = jnp.ones((VIEWS, 1, H, W), jnp.float32)
    exist = jnp.ones((VIEWS, H, W), jnp.float32)
    eye = jnp.tile(jnp.eye(4)[None], (VIEWS, 1, 1)).astype(jnp.float32)

    def score_fn(inp, lbl):
        return model.apply({"params": params}, inp, lbl)

    ccfg = ConsistencyConfig(grid=grid, actual_batch_size=VIEWS, setting=5, variant="poses")
    lcfg = LangevinConfig(n_steps_each=N_STEPS, step_lr=6.2e-6, denoise=False)

    # ---------------- fused (ours) ------------------------------------
    @jax.jit
    def fused(rng, x):
        return simultaneous_inpainting_sample(
            rng, x, score_fn, sigmas, lcfg, ccfg,
            refer_image=refer, refer_mask=mask, sky=sky, exist_mask=exist,
            min_step_to_share=0, grad_ref=1.0, correlation_coefficient=0.01,
            to_world=eye, from_world=eye,
        )

    def time_fused():
        out = jax.block_until_ready(fused(rng, x0))  # compile + warm
        times = []
        # seeds disjoint from the warmup key: identical-input re-executions
        # may be served from the tunnel cache (CLAUDE.md protocol)
        for i in range(3):
            t = time.perf_counter()
            jax.block_until_ready(fused(jax.random.PRNGKey(i + 100), x0))
            times.append(time.perf_counter() - t)
        return min(times)

    # ------------- serialized reference-execution-style ----------------
    score_jit = jax.jit(score_fn)

    @jax.jit
    def update(x, grad, noise, step_size):
        gl = -mask * (x - refer)
        return x + step_size * grad + 1.0 * gl + noise * jnp.sqrt(step_size * 2.0)

    big = grid.big_rows

    @jax.jit
    def unproject_all(x, sigma_mod):
        from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import (
            signed_log_decompress, unproject,
        )
        dist, is_neg = signed_log_decompress(x[:, 0], sigma_mod)
        pts = unproject(dist, grid).reshape(VIEWS * H * W, 3)
        return pts, x[:, 1].reshape(-1), is_neg

    @jax.jit
    def merge_one_view(pts, intens, sigma_mod):
        """One target view's z-buffer merge: the per-origin loop body of the
        reference (KITTISampling.py:283-414) — full work: average AND min
        AND winner intensity AND controlled average, one dispatch per view.
        """
        from simultaneous_diffusion_for_pointclouds_tpu.ops.geometry import (
            log_compress, project_bins,
        )
        row, col, depth_m, _ = project_bins(pts, grid)
        nd = log_compress(depth_m, sigma_mod)
        valid = (col > -1) & (col < W) & (row > -1) & (row < big)
        keys = row * W + col
        stats = zbuffer_stats(keys, nd, intens, valid, big * W + 1)
        d = (stats.sum_value / (stats.count + 1e-9))[: big * W].reshape(big, W)
        i = (stats.sum_payload / (stats.count + 1e-9))[: big * W].reshape(big, W)
        dmin = stats.min_value[: big * W].reshape(big, W)
        imin = stats.min_payload[: big * W].reshape(big, W)
        # controlled average (KITTISampling.py:363-391)
        d_m = jnp.power(2.0, jnp.abs(d) * 6.0 / sigma_mod) - 1.0
        dmin_m = jnp.power(2.0, jnp.abs(dmin) * 6.0 / sigma_mod) - 1.0
        over = d_m > dmin_m + 10.0
        i = jnp.where(over, imin, i)
        d_m = jnp.where(over, dmin_m + 2.0, d_m)
        d = jnp.log2(d_m + 1.0) / 6.0 * sigma_mod
        m = (stats.count > 0)[: big * W].reshape(big, W).astype(jnp.float32)
        return d, i, m

    @jax.jit
    def apply_corr(x, news, masks_img, is_neg):
        d = cz.crop_big_with_negatives(news[:, 0], is_neg, grid, True)
        i = cz.crop_big_with_negatives(news[:, 1], is_neg, grid, False)
        m = cz.crop_big_with_negatives(masks_img, is_neg, grid, False)
        new_images = jnp.stack([d, i], 1)
        corr = -m[:, None] * (1.0 - mask) * (x - new_images)
        return x + 0.01 * corr

    def serialized_once(seed):
        x = x0
        key = jax.random.PRNGKey(seed)
        sig = np.asarray(sigmas)
        for c in range(LEVELS):
            labels = jnp.full((VIEWS,), c, jnp.int32)
            step_size = jnp.float32(6.2e-6 * (sig[c] / sig[-1]) ** 2)
            sigma_mod = jnp.float32(max(sig[c], 1.0))
            for s in range(N_STEPS):
                grad = score_jit(x, labels)
                key, k2 = jax.random.split(key)
                noise = jax.random.normal(k2, x.shape, x.dtype)
                x = update(x, grad, noise, step_size)
                pts, intens, is_neg = unproject_all(x, sigma_mod)
                ds, is_, ms = [], [], []
                for v in range(VIEWS):  # serialized per-view merge
                    d, i, m = merge_one_view(pts, intens, sigma_mod)
                    ds.append(d); is_.append(i); ms.append(m)
                news = jnp.stack([jnp.stack(ds), jnp.stack(is_)], 1)
                x = apply_corr(x, news, jnp.stack(ms), is_neg)
        return jax.block_until_ready(x)

    def time_serialized():
        serialized_once(0)  # warm
        t = time.perf_counter()
        serialized_once(1)
        return time.perf_counter() - t

    # ------------- 21-image (3 scenes x 7 views) north-star shape ------
    def time_21():
        g, a = 3, 7
        b21 = g * a
        x21 = jax.random.uniform(rng, (b21, 2, H, W), jnp.float32)
        mask21 = (
            jax.random.uniform(jax.random.PRNGKey(2), (b21, 2, H, W)) > 0.5
        ).astype(jnp.float32)
        sky21 = jnp.ones((b21, 1, H, W), jnp.float32)
        exist21 = jnp.ones((b21, H, W), jnp.float32)
        eye21 = jnp.tile(jnp.eye(4)[None], (b21, 1, 1)).astype(jnp.float32)
        ccfg21 = ConsistencyConfig(
            grid=grid, actual_batch_size=a, setting=5, variant="poses"
        )

        @jax.jit
        def fused21(r, x):
            return simultaneous_inpainting_sample(
                r, x, score_fn, sigmas, lcfg, ccfg21,
                refer_image=x21, refer_mask=mask21, sky=sky21, exist_mask=exist21,
                min_step_to_share=0, grad_ref=1.0, correlation_coefficient=0.01,
                to_world=eye21, from_world=eye21,
            )

        jax.block_until_ready(fused21(rng, x21))
        times = []
        for i in range(3):  # seeds disjoint from the warmup key (cache)
            t = time.perf_counter()
            jax.block_until_ready(fused21(jax.random.PRNGKey(i + 100), x21))
            times.append(time.perf_counter() - t)
        return min(times)

    # ------------- 42-image (6 scenes x 7 views) reference flagship ----
    def time_42():
        g, a = 6, 7
        b42 = g * a
        lv = 10  # shorter ladder subset: keeps the bench under budget
        sig42 = jnp.asarray(full_sigmas[:: len(full_sigmas) // lv][:lv])
        x42 = jax.random.uniform(rng, (b42, 2, H, W), jnp.float32)
        mask42 = (
            jax.random.uniform(jax.random.PRNGKey(2), (b42, 2, H, W)) > 0.5
        ).astype(jnp.float32)
        sky42 = jnp.ones((b42, 1, H, W), jnp.float32)
        exist42 = jnp.ones((b42, H, W), jnp.float32)
        eye42 = jnp.tile(jnp.eye(4)[None], (b42, 1, 1)).astype(jnp.float32)
        ccfg42 = ConsistencyConfig(
            grid=grid, actual_batch_size=a, setting=5, variant="poses"
        )

        @jax.jit
        def fused42(r, x):
            return simultaneous_inpainting_sample(
                r, x, score_fn, sig42, lcfg, ccfg42,
                refer_image=x42, refer_mask=mask42, sky=sky42, exist_mask=exist42,
                min_step_to_share=0, grad_ref=1.0, correlation_coefficient=0.01,
                to_world=eye42, from_world=eye42,
            )

        jax.block_until_ready(fused42(rng, x42))
        times = []
        for i in range(2):  # seeds disjoint from the warmup key (cache)
            t = time.perf_counter()
            jax.block_until_ready(fused42(jax.random.PRNGKey(i + 100), x42))
            times.append(time.perf_counter() - t)
        return min(times) / (lv * N_STEPS)

    # ------------- second method (3D-noise ids), 8-view HDVMine shape --
    def time_second():
        from simultaneous_diffusion_for_pointclouds_tpu.diffusion.second_method import (
            SecondMethodConfig,
            mine_sampler_grid,
            simultaneous_second_method_sample,
        )

        b = VIEWS
        mgrid = mine_sampler_grid(H, W)
        scfg = SecondMethodConfig(grid=mgrid, setting=4)
        ids = jnp.where(
            mask[:, :1] > 0,
            jnp.arange(b * H * W, dtype=jnp.float32).reshape(b, 1, H, W),
            -1.0,
        )
        mods = np.concatenate(
            [np.zeros((1, 3)), np.random.default_rng(0).uniform(-8, 8, (b - 1, 3))]
        ).astype(np.float32)
        origins = jnp.asarray(cz.effective_origins(mods), jnp.float32)

        @jax.jit
        def fused2(r, x):
            return simultaneous_second_method_sample(
                r, x, score_fn, sigmas, lcfg, scfg,
                refer_image=refer, refer_mask=mask, refer_indices=ids,
                origins=origins, raw_origins=jnp.asarray(mods), grad_ref=1.0,
            )

        jax.block_until_ready(fused2(rng, x0))
        times = []
        for i in range(2):
            t = time.perf_counter()
            jax.block_until_ready(fused2(jax.random.PRNGKey(i + 100), x0))
            times.append(time.perf_counter() - t)
        return min(times)

    fused_t = time_fused()
    serial_t = time_serialized()
    t21 = time_21()
    sps42 = 1.0 / time_42()
    t2nd = time_second()
    total_steps = LEVELS * N_STEPS
    value = total_steps / fused_t
    baseline = total_steps / serial_t
    sps21 = total_steps / t21
    sps2nd = total_steps / t2nd
    full_ladder_steps = 232 * N_STEPS + 1  # incl. final denoise forward
    print(json.dumps({
        "metric": "langevin_steps_per_sec_per_chip_8view_2x64x1024",
        "value": round(value, 3),
        "unit": "steps/s",
        "vs_baseline": round(value / baseline, 3),
        "steps_per_sec_21img_3x7": round(sps21, 3),
        "img_steps_per_sec_21img_3x7": round(sps21 * 21, 1),
        "est_sec_per_scan_set_21img_full_ladder": round(full_ladder_steps / sps21, 1),
        "steps_per_sec_42img_6x7": round(sps42, 3),
        "img_steps_per_sec_42img_6x7": round(sps42 * 42, 1),
        "est_sec_per_scan_set_42img_full_ladder": round(full_ladder_steps / sps42, 1),
        "steps_per_sec_second_method_8view": round(sps2nd, 3),
        "baseline_note": "same-chip reference-launch-structure re-enactment; not a CUDA measurement",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
