"""Annealed Langevin dynamics samplers as single jitted ``lax.scan`` programs.

The reference runs a Python loop over 232 noise levels x 5 steps, launching
~1161 CUDA kernels per score forward plus, for the simultaneous variants, a
serialized per-view consistency loop (models/__init__.py:20-602,
KITTISampling.py:5-513).  Here each sampler is ONE compiled XLA program:
``lax.scan`` over levels, ``lax.scan`` over inner steps, and the cross-view
merge fused in (gated by ``lax.cond`` so early levels skip its cost).

All samplers share the update rule (models/__init__.py:29-36):

    eps = step_lr * (sigma_c / sigma_L)^2
    x  <- x + eps * score(x, c) + grad_ref * (-mask * (x - ref)) +
          sqrt(2 eps) * z

with the reference's exact tail: optional Tweedie denoise
``x += sigma_L^2 * score(x, L-1) + grad_ref * last_grad_likelihood``
followed by a final data-consistency step.

``noise_scale=0`` makes every sampler deterministic (used by parity tests
against the reference with ``torch.randn_like`` stubbed to zeros).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .consistency import (
    ConsistencyConfig,
    consistency_correction,
    shared_view_images,
)

ScoreFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class LangevinConfig:
    n_steps_each: int = 5
    step_lr: float = 6.2e-6
    denoise: bool = True
    noise_scale: float = 1.0
    # emit the state after every noise level (the reference's
    # ``final_only: false`` trajectory dumps); adds an (L, B, C, H, W)
    # output so keep it for small configs/debugging
    collect_levels: bool = False


def _level_noise(rng, c, s, shape, dtype, scale):
    if scale == 0.0:
        return jnp.zeros(shape, dtype)
    key = jax.random.fold_in(jax.random.fold_in(rng, c), s)
    return jax.random.normal(key, shape, dtype) * scale


def anneal_langevin_dynamics(
    rng, x_mod, score_fn: ScoreFn, sigmas, cfg: LangevinConfig,
    start_level=0, total_levels=None, sigma_last=None, finalize: bool = True,
):
    """Unconditional sampler (models/__init__.py:20-57). Returns final x.
    Segmented execution as in :func:`_guided_sample` (carry is just x)."""
    L = sigmas.shape[0]
    Ltot = int(L) if total_levels is None else total_levels
    sigma_last = sigmas[-1] if sigma_last is None else sigma_last
    B = x_mod.shape[0]

    def level(x, cs):
        c, sigma = cs
        labels = jnp.full((B,), c, jnp.int32)
        step_size = cfg.step_lr * (sigma / sigma_last) ** 2

        def step(s, x):
            grad = score_fn(x, labels)
            noise = _level_noise(rng, c, s, x.shape, x.dtype, cfg.noise_scale)
            return x + step_size * grad + noise * jnp.sqrt(step_size * 2.0)

        x = jax.lax.fori_loop(0, cfg.n_steps_each, step, x)
        return x, (x if cfg.collect_levels else None)

    x_mod, trajectory = jax.lax.scan(
        level, x_mod, (jnp.arange(L) + start_level, sigmas)
    )

    if not finalize:
        if cfg.collect_levels:
            return x_mod, trajectory
        return x_mod

    if cfg.denoise:
        labels = jnp.full((B,), Ltot - 1, jnp.int32)
        x_mod = x_mod + sigma_last**2 * score_fn(x_mod, labels)
    if cfg.collect_levels:
        return x_mod, trajectory
    return x_mod


def _guided_sample(
    rng,
    x_mod,
    score_fn: ScoreFn,
    sigmas,
    cfg: LangevinConfig,
    refer_image,
    mask,
    grad_ref: float,
    per_step_extra=None,
    start_level=0,
    total_levels=None,
    sigma_last=None,
    carry_in=None,
    finalize: bool = True,
):
    """Shared body for inpainting/densification/simultaneous: Langevin with
    ``-mask*(x-ref)`` guidance; ``per_step_extra(x, c, s, sigma)`` may return
    an additional additive correction (the cross-view consistency).

    Segmented execution (``runners/sample.py`` ladder chunking — a single
    232-level 42-image execution exceeds the axon tunnel's per-execute
    limit): ``sigmas`` may be one SEGMENT of the ladder, with
    ``start_level`` its absolute offset (int or traced scalar — one compile
    serves every equal-length segment), ``total_levels``/``sigma_last`` the
    global ladder length/tail, ``carry_in`` the previous segment's ``gl``
    and ``finalize=False`` returning ``(x, gl)`` (+trajectory) instead of
    applying the final denoise + data-consistency step.  Noise keys use the
    absolute level index, so chunked == single-execution bitwise."""
    L = sigmas.shape[0]
    Ltot = int(L) if total_levels is None else total_levels
    sigma_last = sigmas[-1] if sigma_last is None else sigma_last
    B = x_mod.shape[0]
    mask = mask.astype(x_mod.dtype)

    def level(carry, cs):
        x, _ = carry
        c, sigma = cs
        labels = jnp.full((B,), c, jnp.int32)
        step_size = cfg.step_lr * (sigma / sigma_last) ** 2

        def step(s, inner):
            x, _ = inner
            grad = jnp.nan_to_num(score_fn(x, labels))
            gl = -mask * (x - refer_image)
            noise = _level_noise(rng, c, s, x.shape, x.dtype, cfg.noise_scale)
            x = x + step_size * grad + grad_ref * gl + noise * jnp.sqrt(step_size * 2.0)
            if per_step_extra is not None:
                x = per_step_extra(x, c, s, sigma)
            return (x, gl)

        x, gl = jax.lax.fori_loop(0, cfg.n_steps_each, step, (x, jnp.zeros_like(x)))
        return (x, gl), (x if cfg.collect_levels else None)

    gl0 = jnp.zeros_like(x_mod) if carry_in is None else carry_in
    (x_mod, gl), trajectory = jax.lax.scan(
        level, (x_mod, gl0), (jnp.arange(L) + start_level, sigmas)
    )

    if not finalize:
        if cfg.collect_levels:
            return x_mod, gl, trajectory
        return x_mod, gl

    if cfg.denoise:
        labels = jnp.full((B,), Ltot - 1, jnp.int32)
        # reference reuses the LAST grad_likelihood here (models/__init__.py:594)
        x_mod = x_mod + sigma_last**2 * score_fn(x_mod, labels) + grad_ref * gl

    # final hard data-consistency step (models/__init__.py:598-599)
    x_mod = x_mod + grad_ref * (-mask * (x_mod - refer_image))
    if cfg.collect_levels:
        # per-level snapshots + the denoised final, matching the reference's
        # images list (models/__init__.py:41-56 appends per level, then the
        # denoised tail), for the final_only: false trajectory dumps
        return x_mod, trajectory
    return x_mod


def anneal_langevin_inpainting(
    rng, x_mod, refer_image, refer_mask, score_fn, sigmas, cfg: LangevinConfig,
    grad_ref: float = 0.1, **segment_kw,
):
    """Masked-fill sampler (models/__init__.py:1385-1442)."""
    return _guided_sample(
        rng, x_mod, score_fn, sigmas, cfg, refer_image, refer_mask, grad_ref,
        **segment_kw,
    )


def anneal_langevin_densification(
    rng, x_mod, refer_image, score_fn, sigmas, cfg: LangevinConfig,
    grad_ref: float = 0.1, sampling_step: int = 16,
):
    """Sparse-to-dense upsampling: guidance on every ``sampling_step``-th row
    (models/__init__.py:59-109)."""
    mask = jnp.zeros_like(x_mod)
    mask = mask.at[:, :, 0 : x_mod.shape[2] : sampling_step, :].set(1.0)
    return _guided_sample(rng, x_mod, score_fn, sigmas, cfg, refer_image, mask, grad_ref)


def ladder_segments(
    num_levels: int, batch: int, n_steps_each: int, rows: int, cols: int,
    override: int = 0,
):
    """(start, length) execution segments for a sigma ladder, or None for a
    single execution.

    Single device executions longer than ~60 s die with a generic TPU
    device error (axon tunnel per-execute ceiling; measured 2026-08-17:
    45 s ok, ~67 s dead — compile time excluded), so budget ~35 s per
    segment using the ~65 image-steps/s/chip rate at 64x1024
    (PERF_NOTES.md) scaled by pixel count.  Prefers a divisor of L so
    every segment shares ONE compiled program; otherwise a ceil-split
    (two program shapes).  ``override`` forces a segment COUNT (1 =
    single execution)."""
    L = int(num_levels)
    if override:
        if override <= 1:
            return None
        seglen = -(-L // override)
    else:
        step_budget = int(2400 * 65536 / (rows * cols))
        max_lv = max(1, step_budget // (max(n_steps_each, 1) * batch))
        if max_lv >= L:
            return None
        seglen = next(
            (d for d in range(max_lv, 0, -1) if L % d == 0 and 2 * d > max_lv),
            max_lv,
        )
    return [(s, min(seglen, L - s)) for s in range(0, L, seglen)]


def _correlation_schedule(variant: str, setting: int, base: float, c, L: int):
    """Level-dependent correlation coefficient.

    offsets: setting 5 -> (c+1)/L, setting 6 -> 0.5 (c+1)/L
    (models/__init__.py:210-213); poses: setting 6 -> (c+1)/L, setting 7 ->
    0.5 (c+1)/L (KITTISampling.py:107-110); otherwise the constant base.
    """
    ramp = (c.astype(jnp.float32) + 1.0) / L
    if variant == "offsets":
        if setting == 5:
            return ramp
        if setting == 6:
            return 0.5 * ramp
    else:
        if setting == 6:
            return ramp
        if setting == 7:
            return 0.5 * ramp
    return jnp.float32(base)


def simultaneous_inpainting_sample(
    rng,
    x_mod,
    score_fn: ScoreFn,
    sigmas,
    cfg: LangevinConfig,
    ccfg: ConsistencyConfig,
    *,
    refer_image,
    refer_mask,
    sky,
    exist_mask,
    min_step_to_share: int = 2,
    grad_ref: float = 0.1,
    correlation_coefficient: float = 0.1,
    origins: Optional[jnp.ndarray] = None,
    to_world: Optional[jnp.ndarray] = None,
    from_world: Optional[jnp.ndarray] = None,
    return_shared: bool = False,
    score_chunks: int = 1,
    start_level=0,
    total_levels: Optional[int] = None,
    sigma_last=None,
    carry_in=None,
    finalize: bool = True,
):
    """THE flagship sampler: joint multi-view inpainting with per-step
    cross-view consistency (models/__init__.py:111-602 "basic" /
    KITTISampling.py:5-513 "kitti").

    ``x_mod``: (B, 2, H, W) with B = scenes * ccfg.actual_batch_size.
    The consistency correction is applied after every Langevin step once the
    level index reaches ``min_step_to_share``; its strength follows the
    setting-dependent schedule.

    Segmented execution: see :func:`_guided_sample` — ``sigmas`` may be one
    ladder segment with ``start_level`` its absolute offset,
    ``total_levels``/``sigma_last`` the global ladder, ``carry_in`` the
    previous segment's ``(gl, shared)``, and ``finalize=False`` returning
    ``(x, gl, shared)`` (+trajectory) without the final denoise/clamp.
    Noise and the correlation schedule use absolute level indices, so
    chunked == single-execution bitwise.
    """
    L = int(sigmas.shape[0])
    Ltot = L if total_levels is None else total_levels
    sigma_last = sigmas[-1] if sigma_last is None else sigma_last
    B = x_mod.shape[0]
    A = ccfg.actual_batch_size
    G = B // A
    mask = refer_mask.astype(x_mod.dtype)
    skyf = sky.astype(x_mod.dtype)

    def score_call(x, labels):
        """Optionally chunk the score forward (lax.map over sub-batches)
        to bound peak activation memory for large sampling batches."""
        if score_chunks <= 1:
            return score_fn(x, labels)
        k = score_chunks
        assert B % k == 0
        xc = x.reshape((k, B // k) + x.shape[1:])
        lc = labels.reshape(k, B // k)
        out = jax.lax.map(lambda args: score_fn(args[0], args[1]), (xc, lc))
        return out.reshape(x.shape)

    def shared_images(x, sigma_mod):
        if not ccfg.sequential_groups or G == 1:
            return shared_view_images(
                x, skyf, exist_mask, ccfg, sigma_mod,
                origins=origins, to_world=to_world, from_world=from_world,
            )
        # one scene group at a time: ~G-fold lower peak HBM.  The exist
        # mask stays the global first A views (models/__init__.py:362) and
        # the divergence guard stays a global max, like the reference.
        exist_a = exist_mask.reshape(B, -1)[:A].reshape((A,) + x.shape[2:])
        group_cfg = dataclasses.replace(ccfg, sequential_groups=False)

        def one_group(args):
            xg, skyg, twg, fwg = args
            ni, mi, _ = shared_view_images(
                xg, skyg, exist_a, group_cfg, sigma_mod,
                origins=origins, to_world=twg, from_world=fwg,
            )
            return ni, mi

        tw = (
            to_world.reshape(G, A, 4, 4) if to_world is not None
            else jnp.zeros((G, A, 4, 4), x.dtype)
        )
        fw = (
            from_world.reshape(G, A, 4, 4) if from_world is not None
            else jnp.zeros((G, A, 4, 4), x.dtype)
        )
        ni, mi = jax.lax.map(
            one_group,
            (
                x.reshape((G, A) + x.shape[1:]),
                skyf.reshape((G, A) + skyf.shape[1:]),
                tw, fw,
            ),
        )
        too_high = (
            jnp.max(jnp.abs(x[:, 0])) * 6.0 / sigma_mod > ccfg.too_high_threshold
        )
        return (
            ni.reshape((B,) + ni.shape[2:]),
            mi.reshape((B,) + mi.shape[2:]),
            too_high,
        )

    def level(carry, cs):
        x, _, shared = carry
        c, sigma = cs
        labels = jnp.full((B,), c, jnp.int32)
        step_size = cfg.step_lr * (sigma / sigma_last) ** 2
        sigma_mod = jnp.maximum(sigma, 1.0)
        corr_coef = _correlation_schedule(
            ccfg.variant, ccfg.setting, correlation_coefficient, c, Ltot
        )

        def consistency(x, shared):
            new_images, mask_images, too_high = shared_images(x, sigma_mod)
            corr = consistency_correction(
                x, new_images, mask_images, skyf, mask, too_high
            )
            return x + corr_coef * corr, new_images

        def step(s, inner):
            x, _, shared = inner
            grad = jnp.nan_to_num(score_call(x, labels))
            gl = -mask * (x - refer_image)
            noise = _level_noise(rng, c, s, x.shape, x.dtype, cfg.noise_scale)
            x = x + step_size * grad + grad_ref * gl + noise * jnp.sqrt(step_size * 2.0)
            x, shared = jax.lax.cond(
                c >= min_step_to_share,
                consistency,
                lambda x, shared: (x, shared),
                x, shared,
            )
            return (x, gl, shared)

        x, gl, shared = jax.lax.fori_loop(
            0, cfg.n_steps_each, step, (x, jnp.zeros_like(x), shared)
        )
        return (x, gl, shared), (x if cfg.collect_levels else None)

    if carry_in is None:
        init = (x_mod, jnp.zeros_like(x_mod), jnp.zeros_like(x_mod))
    else:
        init = (x_mod, carry_in[0], carry_in[1])
    (x_mod, gl, shared), trajectory = jax.lax.scan(
        level, init, (jnp.arange(L) + start_level, sigmas)
    )

    if not finalize:
        if cfg.collect_levels:
            return x_mod, gl, shared, trajectory
        return x_mod, gl, shared

    if cfg.denoise:
        labels = jnp.full((B,), Ltot - 1, jnp.int32)
        x_mod = x_mod + sigma_last**2 * score_call(x_mod, labels) + grad_ref * gl

    x_mod = x_mod + grad_ref * (-mask * (x_mod - refer_image))
    if return_shared:
        return x_mod, shared
    if cfg.collect_levels:
        return x_mod, trajectory
    return x_mod
