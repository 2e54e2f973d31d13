"""Ladder-segment execution scaffolding shared by every sampling flow.

Single device executions beyond ~60 s die with a generic TPU device error
(axon tunnel per-execute ceiling, PERF_NOTES.md), so every sampler program
auto-splits its sigma ladder into ~35 s execution segments
(:func:`diffusion.langevin.ladder_segments`).  Chunked execution is bitwise
identical to a single execution: noise keys and correlation schedules use
absolute level indices, and segments prefer divisors of L so one compiled
program serves every segment.

:class:`SamplerPrograms` is the program-builder mixin used by
``runners.sample.SimultaneousSamplingRunner``: it owns the jitted entry
points for all five sampling flows (progressive ablation joint + baseline,
second method, hyperparameter grid, plain/fast_fid) and the one generic
segment loop that threads their carries — so ladder-chunking changes land
in exactly one place.  The reference has no equivalent: its samplers are
host-side Python loops over levels (models/__init__.py:209,239), which is
also why it has no per-execute ceiling to manage.
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import jax.numpy as jnp

from ..diffusion.consistency import ConsistencyConfig
from ..diffusion.langevin import (
    anneal_langevin_dynamics,
    anneal_langevin_inpainting,
    ladder_segments,
    simultaneous_inpainting_sample,
)
from ..parallel import shard_simultaneous_sampler


class SamplerPrograms:
    """Jitted sampler-program builders with automatic ladder chunking.

    Mixin over a runner that provides: ``model, sigmas, lcfg, mesh, grid,
    views, batch, groups, rows, cols, channels, variant, setting,
    allowance, start_step, correlation_co, grad_ref, sequential_groups,
    score_chunks, exec_level_chunks``.
    """

    # ------------------------------------------------------------------
    # shared plumbing
    def _wrap(self, fn, n_image_args: int, donate=()):
        """jit ``fn`` — through the mesh (batch sharded over (data, view),
        params replicated) when one is configured, plain ``jax.jit``
        otherwise.  ``donate``: argnums of dead-after-call carries (the
        segment loops thread fresh buffers each call) — donated on the
        single-device path to cut HBM allocation churn; the mesh wrapper
        does not donate."""
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=tuple(donate))
        return shard_simultaneous_sampler(fn, self.mesh, n_image_args)

    def _score_fn(self, params):
        def score(x, labels):
            return self.model.apply({"params": params}, x, labels)

        return score

    def _ladder_segments(self, batch=None, n_steps=None):
        """(start, length) per execution segment, or None for a single
        execution — :func:`diffusion.langevin.ladder_segments` with this
        runner's shape and the ``sampling.exec_level_chunks`` override."""
        return ladder_segments(
            int(self.sigmas.shape[0]),
            batch if batch is not None else self.batch,
            n_steps if n_steps is not None else self.lcfg.n_steps_each,
            self.rows, self.cols, override=self.exec_level_chunks,
        )

    def _segment_loop(self, segs, seg_call, carries, post=None, collect=False):
        """Thread ``carries`` through one ``seg_call`` per ladder segment.

        ``seg_call(sig_seg, start_level, *carries)`` returns the new carry
        tuple (single array allowed), with a per-level trajectory appended
        as the LAST element when ``collect``.  ``post`` optionally rewrites
        the carry tuple between segments (the second method re-flattens its
        per-scene axes).  Returns ``(carries, trajectory-or-None)``.
        """
        timing = getattr(self, "segment_timing", False)
        trajs = []
        for start, ln in segs:
            t0 = time.time() if timing else 0.0
            out = seg_call(
                self.sigmas[start : start + ln], jnp.int32(start), *carries
            )
            if collect:
                trajs.append(out[-1])
                out = out[:-1]
            carries = out if isinstance(out, tuple) else (out,)
            if post is not None:
                carries = post(carries)
            if timing:
                # diagnosis mode (sampling.segment_timing): synchronize per
                # segment so wall-clock attributes to THIS segment; the
                # per-level rate exposes in-process slowdowns (PERF_NOTES
                # B=42 investigation) at segment granularity
                jax.block_until_ready(carries[0])
                dt = time.time() - t0
                n_steps = getattr(self.lcfg, "n_steps_each", 1)
                logging.info(
                    "[segtime] levels %d..%d (%d): %.2fs = %.3fs/step",
                    start, start + ln - 1, ln, dt, dt / (ln * n_steps),
                )
        return carries, (jnp.concatenate(trajs) if collect else None)

    def _make_finalizer(self, grad_ref: float, denoise=None):
        """The sampler tail as its own small jit: optional Tweedie denoise
        with the ladder's last sigma + the hard data-consistency step."""
        Ltot = int(self.sigmas.shape[0])
        sigma_last = self.sigmas[-1]
        denoise = self.lcfg.denoise if denoise is None else denoise

        def fin(params, rng, x, refer, mask, gl):
            score = self._score_fn(params)
            B = x.shape[0]
            maskf = mask.astype(x.dtype)
            if denoise:
                labels = jnp.full((B,), Ltot - 1, jnp.int32)
                if self.score_chunks > 1:
                    k = self.score_chunks
                    xc = x.reshape((k, B // k) + x.shape[1:])
                    lc = labels.reshape(k, B // k)
                    g = jax.lax.map(
                        lambda a: score(a[0], a[1]), (xc, lc)
                    ).reshape(x.shape)
                else:
                    g = score(x, labels)
                x = x + sigma_last**2 * g + grad_ref * gl
            return x + grad_ref * (-maskf * (x - refer))

        return self._wrap(fin, n_image_args=4)

    # ------------------------------------------------------------------
    # plain (unconditional) sampler: plain_sample / fast_fid
    def _plain_sampler(self, lcfg, batch):
        """Unconditional sampler callable, ladder-chunked when the
        execution would exceed the ceiling."""
        segs = self._ladder_segments(batch=batch, n_steps=lcfg.n_steps_each)
        if segs is None:
            return self._wrap(
                lambda p, r, x: anneal_langevin_dynamics(
                    r, x, self._score_fn(p), self.sigmas, lcfg
                ),
                n_image_args=1,
            )
        Ltot = int(self.sigmas.shape[0])
        seg_j = self._wrap(
            lambda p, r, x, sig, start: anneal_langevin_dynamics(
                r, x, self._score_fn(p), sig, lcfg,
                start_level=start, total_levels=Ltot,
                sigma_last=self.sigmas[-1], finalize=False,
            ),
            n_image_args=1,
            donate=(2,),
        )
        fin_j = self._wrap(
            lambda p, r, x: (
                x
                + self.sigmas[-1] ** 2
                * self._score_fn(p)(
                    x, jnp.full((x.shape[0],), Ltot - 1, jnp.int32)
                )
                if lcfg.denoise
                else x
            ),
            n_image_args=1,
        )

        def sampler(p, r, x):
            (x,), traj = self._segment_loop(
                segs,
                lambda sig, start, x: seg_j(p, r, x, sig, start),
                (x,),
                collect=lcfg.collect_levels,
            )
            x = fin_j(p, r, x)
            if lcfg.collect_levels:
                return x, traj
            return x

        return sampler

    # ------------------------------------------------------------------
    # second-method (3D-noise) sampler
    @functools.lru_cache(maxsize=16)
    def _jit_second_method(self, views: int):
        """3D-noise sampler (config ``sampling.method: second``); the
        reference dispatches it for doThis>=8 (dead in the shipped ranges)
        but it is a first-class method here.  For the poses runner family
        this is the debugged redesign of the reference's pose twin
        (KITTISampling.py:515-1299 — world-frame sharing via
        to_world/from_world, denoise forced off per :518; see
        SecondMethodConfig.variant)."""
        import dataclasses

        from ..diffusion.second_method import (
            SecondMethodConfig,
            mine_sampler_grid,
            second_method_prelude,
            simultaneous_second_method_sample,
        )

        pose_mode = self.variant == "poses"
        scfg = SecondMethodConfig(
            grid=mine_sampler_grid(self.rows, self.cols), setting=self.setting,
            variant=self.variant,
        )
        # the reference pose twin hard-codes denoise = False (:518)
        lcfg = (
            dataclasses.replace(self.lcfg, denoise=False)
            if pose_mode
            else self.lcfg
        )
        groups = self.groups

        def _per_scene(fn, n_view_args, n_scene_args=0):
            """Apply ``fn(params, rng, *view_args, *scene_args, *tail)``
            independently per scene (the sampler's id table / cloud is
            single-scene state — the reference only ever calls it with one
            scene's views, ncsn_runner_basic_simultaneous.py:624): per-scene
            id tables, per-scene reprojection, no cross-scene
            scatter-averaging.  ``view_args`` are flat (G*A, ...) arrays
            (reshaped per scene); ``scene_args`` are (G, ...) arrays mapped
            as-is; outputs keep the fn's per-scene shapes under a leading G
            axis — flatten view-batch outputs with ``_flat``."""

            def wrapped(params, rng, *args):
                va = args[:n_view_args]
                sa = args[n_view_args : n_view_args + n_scene_args]
                tail = args[n_view_args + n_scene_args :]
                if groups == 1:
                    return fn(params, rng, *va, *sa, *tail)

                def resh(a):
                    return a.reshape((groups, views) + a.shape[1:])

                return jax.vmap(
                    lambda r, *m: fn(params, r, *m, *tail),
                    in_axes=(0,) + (0,) * (n_view_args + n_scene_args),
                )(jax.random.split(rng, groups), *(resh(a) for a in va), *sa)

            return wrapped

        def _flat(out):
            if groups == 1:
                return out
            return out.reshape((groups * views,) + out.shape[2:])

        segs = self._ladder_segments()
        Ltot = int(self.sigmas.shape[0])
        # pose mode appends (to_world, from_world) as two extra per-view args
        n_va = 8 if pose_mode else 6

        if segs is None:

            def one_scene(params, rng, x, refer, mask, indices, origins,
                          raw_origins, *pose):
                return simultaneous_second_method_sample(
                    rng, x, self._score_fn(params), self.sigmas, lcfg, scfg,
                    refer_image=refer, refer_mask=mask, refer_indices=indices,
                    origins=origins, raw_origins=raw_origins,
                    to_world=pose[0] if pose_mode else None,
                    from_world=pose[1] if pose_mode else None,
                    grad_ref=self.grad_ref,
                )

            inner = _per_scene(one_scene, n_va)

            def run(params, rng, *args):
                return _flat(inner(params, rng, *args))

            # all args after (params, rng) are per-view batch-leading arrays
            return self._wrap(run, n_image_args=n_va)

        # chunked ladder: prelude (nudge + ids + setting-7 median) once,
        # then one compiled segment program re-used for every segment, then
        # the shared finalizer
        def pre_scene(params, rng, x, refer, mask, indices, origins,
                      raw_origins, *pose):
            return second_method_prelude(
                x, refer_image=refer, refer_mask=mask, refer_indices=indices,
                origins=origins, raw_origins=raw_origins,
                to_world=pose[0] if pose_mode else None, scfg=scfg,
                grad_ref=self.grad_ref,
            )

        def seg_scene(params, rng, *args):
            x, refer, mask, indices, ids, gl, origins, raw_origins = args[:8]
            pose = args[8 : n_va + 2]
            gt_med, sig_seg, start_level = args[n_va + 2 :]
            return simultaneous_second_method_sample(
                rng, x, self._score_fn(params), sig_seg, lcfg, scfg,
                refer_image=refer, refer_mask=mask, refer_indices=indices,
                origins=origins, raw_origins=raw_origins,
                to_world=pose[0] if pose_mode else None,
                from_world=pose[1] if pose_mode else None,
                grad_ref=self.grad_ref, start_level=start_level,
                total_levels=Ltot, sigma_last=self.sigmas[-1],
                carry_in=(ids, gl, gt_med), finalize=False,
            )

        pre_j = self._wrap(_per_scene(pre_scene, n_va), n_image_args=n_va)
        seg_j = self._wrap(
            _per_scene(seg_scene, n_va + 2, n_scene_args=1),
            n_image_args=n_va + 2,
        )
        fin_j = self._make_finalizer(self.grad_ref, denoise=lcfg.denoise)

        def run_chunked(params, rng, x, refer, mask, indices, origins,
                        raw_origins, *pose):
            x, (ids, gl, gt_med) = pre_j(
                params, rng, x, refer, mask, indices, origins, raw_origins,
                *pose,
            )
            x, ids, gl = _flat(x), _flat(ids), _flat(gl)  # gt_med stays (G, 3)
            (x, ids, gl, gt_med), _ = self._segment_loop(
                segs,
                lambda sig, start, x, ids, gl, gt_med: seg_j(
                    params, rng, x, refer, mask, indices, ids, gl,
                    origins, raw_origins, *pose, gt_med, sig, start,
                ),
                (x, ids, gl, gt_med),
                post=lambda c: (_flat(c[0]), _flat(c[1]), _flat(c[2]), c[3]),
            )
            # finalizer is scene-agnostic (elementwise + score forward)
            return fin_j(params, rng, x, refer, mask, gl)

        return run_chunked

    # ------------------------------------------------------------------
    # simultaneous (cross-view consistency) sampler
    @functools.lru_cache(maxsize=16)
    def _jit_simultaneous(self, views: int):
        ccfg = ConsistencyConfig(
            grid=self.grid,
            actual_batch_size=views,
            setting=self.setting,
            allowance=float(self.allowance),
            variant=self.variant,
            sequential_groups=self.sequential_groups,
        )

        segs = self._ladder_segments()
        Ltot = int(self.sigmas.shape[0])

        def _kw(origins, to_world, from_world):
            return (
                dict(origins=origins)
                if self.variant == "offsets"
                else dict(to_world=to_world, from_world=from_world)
            )

        if segs is None:

            def run(params, rng, x, refer, mask, sky, exist, to_world, from_world, origins):
                return simultaneous_inpainting_sample(
                    rng, x, self._score_fn(params), self.sigmas, self.lcfg, ccfg,
                    refer_image=refer, refer_mask=mask, sky=sky, exist_mask=exist,
                    min_step_to_share=self.start_step, grad_ref=self.grad_ref,
                    correlation_coefficient=self.correlation_co,
                    score_chunks=self.score_chunks,
                    **_kw(origins, to_world, from_world),
                )

            # 7 batch-leading args (x..from_world); per-view origins replicate
            return self._wrap(run, n_image_args=7)

        def seg_fn(params, rng, x, refer, mask, sky, exist, to_world,
                   from_world, gl, shared, origins, sig_seg, start_level):
            return simultaneous_inpainting_sample(
                rng, x, self._score_fn(params), sig_seg, self.lcfg, ccfg,
                refer_image=refer, refer_mask=mask, sky=sky, exist_mask=exist,
                min_step_to_share=self.start_step, grad_ref=self.grad_ref,
                correlation_coefficient=self.correlation_co,
                score_chunks=self.score_chunks,
                start_level=start_level, total_levels=Ltot,
                sigma_last=self.sigmas[-1], carry_in=(gl, shared),
                finalize=False, **_kw(origins, to_world, from_world),
            )

        # gl/shared are image-shaped carries: shard them like the batch;
        # carries (x, gl, shared) are dead after each segment -> donated
        seg_j = self._wrap(seg_fn, n_image_args=9, donate=(2, 9, 10))
        fin_j = self._make_finalizer(self.grad_ref)

        def run_chunked(params, rng, x, refer, mask, sky, exist, to_world,
                        from_world, origins):
            (x, gl, shared), traj = self._segment_loop(
                segs,
                lambda sig, start, x, gl, shared: seg_j(
                    params, rng, x, refer, mask, sky, exist, to_world,
                    from_world, gl, shared, origins, sig, start,
                ),
                (x, jnp.zeros_like(x), jnp.zeros_like(x)),
                collect=self.lcfg.collect_levels,
            )
            x = fin_j(params, rng, x, refer, mask, gl)
            if self.lcfg.collect_levels:
                return x, traj
            return x

        return run_chunked

    # ------------------------------------------------------------------
    # plain per-view inpainting baseline
    @functools.lru_cache(maxsize=4)
    def _jit_inpainting(self):
        segs = self._ladder_segments()
        if segs is None:

            def run(params, rng, x, refer, mask):
                return anneal_langevin_inpainting(
                    rng, x, refer, mask, self._score_fn(params), self.sigmas,
                    self.lcfg, grad_ref=1.0,
                )

            return self._wrap(run, n_image_args=3)

        Ltot = int(self.sigmas.shape[0])

        def seg_fn(params, rng, x, refer, mask, gl, sig_seg, start_level):
            return anneal_langevin_inpainting(
                rng, x, refer, mask, self._score_fn(params), sig_seg,
                self.lcfg, grad_ref=1.0,
                start_level=start_level, total_levels=Ltot,
                sigma_last=self.sigmas[-1], carry_in=gl, finalize=False,
            )

        seg_j = self._wrap(seg_fn, n_image_args=4, donate=(2, 5))
        fin_j = self._make_finalizer(1.0)

        def run_chunked(params, rng, x, refer, mask):
            (x, gl), traj = self._segment_loop(
                segs,
                lambda sig, start, x, gl: seg_j(
                    params, rng, x, refer, mask, gl, sig, start
                ),
                (x, jnp.zeros_like(x)),
                collect=self.lcfg.collect_levels,
            )
            x = fin_j(params, rng, x, refer, mask, gl)
            if self.lcfg.collect_levels:
                return x, traj
            return x

        return run_chunked

    # ------------------------------------------------------------------
    # hyperparameter-grid ablation (NCSNRunnerBasicSimultaneous.sample,
    # ncsn_runner_basic_simultaneous.py:495-565): six (correlation, gradRef)
    # variants incl. the correlation=0 pure-independent baseline, setting 4,
    # startStep 20, offset origins from config modifications.
    GRID_VARIANTS = [
        (0.05, 1.0), (0.05, 0.9), (0.1, 0.9), (0.0, 0.5), (0.1, 0.5), (0.1, 0.25),
    ]

    @functools.lru_cache(maxsize=4)
    def _jit_grid(self, views: int):
        """One cached jit for all six grid variants: ``correlation`` and
        ``grad_ref`` are purely-arithmetic scalars in the sampler, so they
        are traced arguments — no recompile per variant (the reference's
        setting-4 schedule reduces to the constant base, langevin.py:178)."""
        ccfg = ConsistencyConfig(
            grid=self.grid, actual_batch_size=views, setting=4,
            variant="offsets",
        )

        segs = self._ladder_segments()
        if segs is None:

            def run(params, rng, x, refer, mask, sky, exist, origins, corr, gref):
                return simultaneous_inpainting_sample(
                    rng, x, self._score_fn(params), self.sigmas, self.lcfg, ccfg,
                    refer_image=refer, refer_mask=mask, sky=sky, exist_mask=exist,
                    min_step_to_share=20, grad_ref=gref,
                    correlation_coefficient=corr, origins=origins,
                )

            return self._wrap(run, n_image_args=5)

        Ltot = int(self.sigmas.shape[0])

        def seg_fn(params, rng, x, refer, mask, sky, exist, gl, shared,
                   origins, corr, gref, sig_seg, start_level):
            return simultaneous_inpainting_sample(
                rng, x, self._score_fn(params), sig_seg, self.lcfg, ccfg,
                refer_image=refer, refer_mask=mask, sky=sky, exist_mask=exist,
                min_step_to_share=20, grad_ref=gref,
                correlation_coefficient=corr, origins=origins,
                start_level=start_level, total_levels=Ltot,
                sigma_last=self.sigmas[-1], carry_in=(gl, shared),
                finalize=False,
            )

        seg_j = self._wrap(seg_fn, n_image_args=7, donate=(2, 7, 8))

        def fin_fn(params, rng, x, refer, mask, gl, gref):
            # grad_ref is a traced grid variant scalar here, so the shared
            # _make_finalizer (static grad_ref) doesn't apply
            maskf = mask.astype(x.dtype)
            if self.lcfg.denoise:
                labels = jnp.full((x.shape[0],), Ltot - 1, jnp.int32)
                g = self._score_fn(params)(x, labels)
                x = x + self.sigmas[-1] ** 2 * g + gref * gl
            return x + gref * (-maskf * (x - refer))

        fin_j = self._wrap(fin_fn, n_image_args=4)

        def run_chunked(params, rng, x, refer, mask, sky, exist, origins, corr, gref):
            def seg_call(sig, start, x, gl, shared):
                out = seg_j(
                    params, rng, x, refer, mask, sky, exist, gl, shared,
                    origins, corr, gref, sig, start,
                )
                # drop the per-level trajectory if collect_levels leaked in
                return out[:3] if self.lcfg.collect_levels else out

            (x, gl, shared), _ = self._segment_loop(
                segs, seg_call, (x, jnp.zeros_like(x), jnp.zeros_like(x))
            )
            return fin_j(params, rng, x, refer, mask, gl, gref)

        return run_chunked
