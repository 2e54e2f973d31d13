"""Training runners.

:class:`CurriculumTrainer` reproduces the simultaneous runners' training
loop (ncsn_runner_kitti_simultaneous.py:83-348): per batch, untrusted pixels
are initialised with max noise, then an inpainting-aware curriculum walks
noise levels 0..maxTimeStepReachable-1 — each level adds that level's noise
to *trusted* pixels, takes a masked-DSM gradient step, and refines the
untrusted pixels with ``n_steps_each`` Langevin steps reusing the scores
from the loss forward.  ``maxTimeStepReachable`` grows by one every 20
curriculum steps.

:class:`BaseTrainer` is the plain LiDARGen loop (ncsn_runner.py:42-221):
random-sigma DSM on full images.

Both are built on a single jitted ``train_step``; the device never sees
Python control flow.  State is a plain dict pytree {params, opt_state,
ema_params}, checkpointed with Orbax every ``snapshot_freq`` true steps.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import cfg_get
from ..data.loader import BatchLoader, SceneBlockSampler
from ..data.registry import get_dataset
from ..data.transforms import data_transform
from ..diffusion.dsm import (
    anneal_dsm_score_estimation,
    anneal_dsm_score_estimation_with_mask,
)
from ..diffusion.sigmas import get_sigmas
from ..models import ema_init, ema_update, get_model, get_optimizer
from ..parallel import maybe_mesh, shard_base_step, shard_train_step
from ..utils.checkpoint import load_progress, restore_checkpoint, save_checkpoint
from ..utils.logging_utils import MetricsLogger


def _stop_requested(log_path, t0, max_seconds) -> bool:
    """Graceful time-bounded training: stop when ``training.max_seconds``
    of wall clock have elapsed or when a ``STOP`` file appears in the log
    dir (lets an operator end a long run cleanly — never SIGKILL a process
    mid-TPU-execution, see CLAUDE.md).  A final checkpoint is written by
    the caller before returning."""
    if max_seconds is not None and time.time() - t0 > max_seconds:
        logging.info("training.max_seconds (%s) reached; stopping", max_seconds)
        return True
    if log_path and os.path.exists(os.path.join(log_path, "STOP")):
        logging.info("STOP file found in %s; stopping", log_path)
        return True
    return False


class CurriculumTrainer:
    def __init__(self, args, config):
        self.args = args
        self.config = config
        self.model = get_model(config)
        self.sigmas = get_sigmas(config)
        self.optimizer = get_optimizer(config)
        self.ema_rate = cfg_get(config, "model.ema_rate", 0.999)
        self.use_ema = cfg_get(config, "model.ema", True)
        self.n_steps_each = cfg_get(config, "sampling.n_steps_each", 5)
        self.step_lr = cfg_get(config, "sampling.step_lr", 6.2e-6)
        self.anneal_power = cfg_get(config, "training.anneal_power", 2.0)
        # Multi-device: jit the step over the (data, view) mesh by default
        # whenever more than one device is visible (``parallel.enable``) —
        # the TPU counterpart of the reference wrapping every model in
        # nn.DataParallel (ncsn_runner.py:55).  Params replicate; the batch
        # shards; XLA psums the gradients over ICI.
        self.mesh = maybe_mesh(config)
        if self.mesh is not None:
            logging.info("training over mesh %s", self.mesh)
            self._train_step = shard_train_step(self.train_step_impl, self.mesh)
        else:
            self._train_step = self.train_step

    # ------------------------------------------------------------------
    def init_state(self, rng, example) -> Dict:
        variables = self.model.init(
            rng, example, jnp.zeros((example.shape[0],), jnp.int32)
        )
        params = variables["params"]
        return {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "ema_params": ema_init(params),
        }

    # the state is donated: the old buffers are dead after each step, so
    # XLA updates the ~450 MB state in place instead of double-buffering it
    # (donation is a no-op on CPU; x is NOT donated — callers may alias it
    # with original_x)
    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1,))
    def train_step(self, state, rng, x, original_x, mask, timestep):
        return self.train_step_impl(state, rng, x, original_x, mask, timestep)

    def train_step_impl(self, state, rng, x, original_x, mask, timestep):
        """One curriculum level: add noise at ``timestep`` to trusted pixels,
        masked-DSM gradient step, Langevin-refine untrusted pixels."""
        sigmas = self.sigmas
        b = x.shape[0]
        labels = jnp.full((b,), timestep, jnp.int32)
        used = sigmas[labels].reshape((b,) + (1,) * (x.ndim - 1))
        noise_rng, langevin_rng = jax.random.split(rng)
        noise = jax.random.normal(noise_rng, x.shape, x.dtype) * used
        x = x + noise * mask

        def loss_fn(params):
            def score_fn(inp, lbl):
                return self.model.apply({"params": params}, inp, lbl)

            loss, scores = anneal_dsm_score_estimation_with_mask(
                score_fn, x, labels, sigmas, noise, mask, self.anneal_power
            )
            return loss, scores

        (loss, scores), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt_state = self.optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        ema_params = (
            ema_update(state["ema_params"], params, self.ema_rate)
            if self.use_ema
            else state["ema_params"]
        )

        # Langevin refinement of untrusted pixels, reusing the loss scores
        # (reference :205-222 keeps `grad` fixed across the 5 steps).
        step_size = self.step_lr * (sigmas[timestep] / sigmas[-1]) ** 2

        def refine(s, x):
            z = jax.random.normal(jax.random.fold_in(langevin_rng, s), x.shape, x.dtype)
            pred = x + step_size * scores + z * jnp.sqrt(step_size * 2.0)
            return original_x * mask + pred * (1.0 - mask)

        x = jax.lax.fori_loop(0, self.n_steps_each, refine, x)

        new_state = {"params": params, "opt_state": opt_state, "ema_params": ema_params}
        return new_state, x, loss

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, params, rng, x, mask, timestep):
        """Cheap single-level test loss.  Untrusted pixels get the max-noise
        init the curriculum trains with (train():207-211 / reference
        :264) — without it the inputs are out-of-distribution and the loss
        is dominated by the clean-invalid-region mismatch."""
        sigmas = self.sigmas
        b = x.shape[0]
        init_rng, noise_rng = jax.random.split(rng)
        x = x + jax.random.normal(init_rng, x.shape, x.dtype) * sigmas[0] * (
            1.0 - mask
        )
        labels = jnp.full((b,), timestep, jnp.int32)
        used = sigmas[labels].reshape((b,) + (1,) * (x.ndim - 1))
        noise = jax.random.normal(noise_rng, x.shape, x.dtype) * used
        x_pert = x + noise * mask

        def score_fn(inp, lbl):
            return self.model.apply({"params": params}, inp, lbl)

        loss, scores = anneal_dsm_score_estimation_with_mask(
            score_fn, x_pert, labels, sigmas, noise, mask, self.anneal_power
        )
        return loss, scores

    @functools.partial(jax.jit, static_argnums=0)
    def eval_curriculum(self, params, rng, x, mask):
        """Faithful test loss: REPLAY the training curriculum on a test
        batch — max-noise init of untrusted pixels, then every noise level
        adds its noise to trusted pixels, takes the masked-DSM loss, and
        Langevin-refines untrusted pixels reusing the level's scores —
        exactly the reference's in-training test block
        (ncsn_runner_kitti_simultaneous.py:240-290); returns the mean loss
        over levels (lossTotal / maxTimeStepReachable)."""
        sigmas = self.sigmas
        b = x.shape[0]
        original = x
        maskf = mask.astype(x.dtype)
        init_rng, rng = jax.random.split(rng)
        x = x + jax.random.normal(init_rng, x.shape, x.dtype) * sigmas[0] * (
            1.0 - maskf
        )

        def score_fn(inp, lbl):
            return self.model.apply({"params": params}, inp, lbl)

        def level(carry, cs):
            x, rng = carry
            c, sigma = cs
            rng, nrng, lrng = jax.random.split(rng, 3)
            noise = jax.random.normal(nrng, x.shape, x.dtype) * sigma
            x = x + noise * maskf
            labels = jnp.full((b,), c, jnp.int32)
            loss, scores = anneal_dsm_score_estimation_with_mask(
                score_fn, x, labels, sigmas, noise, maskf, self.anneal_power
            )
            step_size = self.step_lr * (sigma / sigmas[-1]) ** 2

            def refine(s, x):
                z = jax.random.normal(
                    jax.random.fold_in(lrng, s), x.shape, x.dtype
                )
                pred = x + step_size * scores + z * jnp.sqrt(step_size * 2.0)
                return original * maskf + pred * (1.0 - maskf)

            x = jax.lax.fori_loop(0, self.n_steps_each, refine, x)
            return (x, rng), loss

        L = int(sigmas.shape[0])
        (_, _), losses = jax.lax.scan(
            level, (x, rng), (jnp.arange(L, dtype=jnp.int32), sigmas)
        )
        return jnp.mean(losses), losses

    # ------------------------------------------------------------------
    def train(self, max_steps: Optional[int] = None):
        cfg = self.config
        train_ds, test_ds = get_dataset(self.args, cfg)
        views = cfg_get(cfg, "sampling.actualBatchSize", 8)
        batch = cfg_get(cfg, "training.batch_size", 8)
        scenes = len(train_ds) // views
        loader = BatchLoader(
            train_ds,
            batch_size=batch,
            sampler=SceneBlockSampler(scenes, views, shuffle=True),
            num_workers=cfg_get(cfg, "data.num_workers", 4),
        )
        test_loader = BatchLoader(
            test_ds,
            batch_size=batch,
            sampler=SceneBlockSampler(len(test_ds) // views, views, shuffle=True, seed=7),
            num_workers=2,
        )

        rng = jax.random.PRNGKey(getattr(self.args, "seed", 1234))
        h = cfg_get(cfg, "data.image_size")
        w = cfg_get(cfg, "data.image_width")
        c = cfg_get(cfg, "data.channels", 2)
        state = self.init_state(rng, jnp.zeros((batch, c, h, w), jnp.float32))

        metrics = MetricsLogger(log_path := getattr(self.args, "log_path", None))
        n_iters = max_steps or cfg_get(cfg, "training.n_iters", 300001)
        snapshot_freq = cfg_get(cfg, "training.snapshot_freq", 2000)
        max_reachable = 1
        step = true_step = 0
        if getattr(self.args, "resume_training", False) and log_path:
            if os.path.isdir(os.path.join(log_path, "ckpt")):
                # like the reference (ncsn_runner.py:65-74 /
                # ncsn_runner_kitti_simultaneous.py:115-135): restore params
                # + counters (the reference stores epoch/step in the ckpt,
                # ncsn_runner.py:168-179); keep a fresh start if the restore
                # fails structurally
                try:
                    state = restore_checkpoint(log_path, target=state)
                    prog = load_progress(log_path)
                    if prog is not None:
                        step = int(prog["step"])
                        true_step = int(prog["true_step"])
                        max_reachable = int(prog["max_reachable"])
                    logging.info(
                        "resumed from %s/ckpt (step %d, true %d, reachable %d)",
                        log_path, step, true_step, max_reachable,
                    )
                except Exception as exc:  # pragma: no cover
                    logging.warning("resume failed (%s); training fresh", exc)
        test_iter = iter(test_loader)
        t0 = time.time()
        max_seconds = cfg_get(cfg, "training.max_seconds", None)

        def progress():
            return {
                "step": step,
                "true_step": true_step,
                "max_reachable": max_reachable,
            }

        for epoch in range(cfg_get(cfg, "training.n_epochs", 1)):
            for batch_np in loader:
                step += 1
                x = jnp.asarray(batch_np["real"])
                mask = jnp.asarray(batch_np["known"])
                x = data_transform(cfg, x)
                original_x = x
                rng, init_rng = jax.random.split(rng)
                # max-noise init of untrusted pixels (:186-190)
                used0 = self.sigmas[0]
                x = x + jax.random.normal(init_rng, x.shape, x.dtype) * used0 * (
                    1.0 - mask
                )

                for timestep in range(max_reachable):
                    true_step += 1
                    rng, step_rng = jax.random.split(rng)
                    state, x, loss = self._train_step(
                        state, step_rng, x, original_x, mask, timestep
                    )
                    if true_step % 10 == 0:
                        metrics.scalar("loss", loss, true_step)
                        logging.info(
                            "step: %d, timestep: %d, loss: %.5f (%.2f s)",
                            step, timestep, float(loss), time.time() - t0,
                        )
                    if step >= n_iters or _stop_requested(log_path, t0, max_seconds):
                        save_checkpoint(log_path, state, step, progress()) if log_path else None
                        metrics.close()
                        return state
                    if step % 100 == 0 and timestep == 0:
                        try:
                            tb = next(test_iter)
                        except StopIteration:
                            test_iter = iter(test_loader)
                            tb = next(test_iter)
                        rng, eval_rng = jax.random.split(rng)
                        params = (
                            state["ema_params"] if self.use_ema else state["params"]
                        )
                        tl, _ = self.eval_step(
                            params, eval_rng,
                            data_transform(cfg, jnp.asarray(tb["real"])),
                            jnp.asarray(tb["known"]), 0,
                        )
                        metrics.scalar("test_loss", tl, true_step)
                        logging.info("step: %d, test_loss: %.5f", step, float(tl))
                    if true_step % 20 == 0 and max_reachable < len(self.sigmas):
                        max_reachable += 1
                    if log_path and true_step % snapshot_freq == 0:
                        save_checkpoint(log_path, state, step, progress())
                        if cfg_get(cfg, "training.snapshot_sampling", False):
                            self._snapshot_sample(state, rng, step, log_path)
        metrics.close()
        return state

    # ------------------------------------------------------------------
    def _snapshot_sample(self, state, rng, step, log_path):
        """Unconditional sample grid during training
        (ncsn_runner.py:181-218 / ncsn_runner_kitti_simultaneous.py:308-345)."""
        import os

        from ..data.transforms import inverse_data_transform
        from ..diffusion.langevin import (
            LangevinConfig,
            anneal_langevin_dynamics,
            ladder_segments,
        )
        from ..utils.images import save_sample_grid

        cfg = self.config
        h = cfg_get(cfg, "data.image_size")
        w = cfg_get(cfg, "data.image_width")
        c = cfg_get(cfg, "data.channels", 2)
        params = state["ema_params"] if self.use_ema else state["params"]
        init = jax.random.uniform(rng, (36, c, h, w), jnp.float32)

        def score_fn(x, labels):
            return self.model.apply({"params": params}, x, labels)

        lcfg = LangevinConfig(
            n_steps_each=self.n_steps_each, step_lr=self.step_lr,
            denoise=cfg_get(cfg, "sampling.denoise", True),
        )
        L = int(self.sigmas.shape[0])
        segs = ladder_segments(L, 36, lcfg.n_steps_each, h, w)
        if segs is None:
            sample = anneal_langevin_dynamics(rng, init, score_fn, self.sigmas, lcfg)
        else:
            # per-execute ceiling (see ladder_segments): run the ladder in
            # carried segments, then the denoise tail
            x = init
            for start, ln in segs:
                x = anneal_langevin_dynamics(
                    rng, x, score_fn, self.sigmas[start : start + ln], lcfg,
                    start_level=jnp.int32(start), total_levels=L,
                    sigma_last=self.sigmas[-1], finalize=False,
                )
            if lcfg.denoise:
                labels = jnp.full((x.shape[0],), L - 1, jnp.int32)
                x = x + self.sigmas[-1] ** 2 * score_fn(x, labels)
            sample = x
        sample = np.asarray(inverse_data_transform(cfg, sample))
        sample_dir = os.path.join(log_path, "samples")
        os.makedirs(sample_dir, exist_ok=True)
        np.save(os.path.join(sample_dir, f"samples_{step}.npy"), sample)
        if sample.shape[1] == 2:
            save_sample_grid(
                sample, os.path.join(sample_dir, f"image_grid_{step}.png"), 6
            )

    # ------------------------------------------------------------------
    def test(self, steps: int = 4):
        """Checkpoint loss sweep: mean curriculum-replay test loss for
        EVERY saved checkpoint between test.begin_ckpt and test.end_ckpt,
        like the reference ``--test`` mode (ncsn_runner.py:571-621) with the
        simultaneous runner's curriculum test semantics (:240-290).
        ``steps`` = test batches per checkpoint (each replays all L
        levels)."""
        import glob as globmod
        import os

        cfg = self.config
        _, test_ds = get_dataset(self.args, cfg)
        views = cfg_get(cfg, "sampling.actualBatchSize", 8)
        loader = BatchLoader(
            test_ds,
            batch_size=cfg_get(cfg, "test.batch_size", 8),
            sampler=SceneBlockSampler(len(test_ds) // views, views, shuffle=False),
            num_workers=2,
        )
        begin = cfg_get(cfg, "test.begin_ckpt", 0)
        end = cfg_get(cfg, "test.end_ckpt", 10**9)
        ckpts = []
        for path in sorted(globmod.glob(os.path.join(self.args.log_path, "ckpt_*"))):
            try:
                step = int(os.path.basename(path).split("_")[1])
            except (IndexError, ValueError):
                continue
            if begin <= step <= end:
                ckpts.append(step)
        if not ckpts:
            ckpts = [None]  # rolling checkpoint only

        batches = []
        for i, b in enumerate(loader):
            if i >= steps:
                break
            batches.append(b)

        # full curriculum replay per test batch (the reference's in-training
        # test block, ncsn_runner_kitti_simultaneous.py:240-290): mean
        # masked-DSM loss over all L levels, plus a few per-level probes
        L = int(self.sigmas.shape[0])
        probes = sorted({0, L // 4, L // 2, (3 * L) // 4, L - 1})
        results = {}
        rng = jax.random.PRNGKey(0)
        for step in ckpts:
            state = restore_checkpoint(self.args.log_path, step)
            params = state["ema_params"] if self.use_ema else state["params"]
            means, curves = [], []
            for b in batches:
                rng, r = jax.random.split(rng)
                mean_loss, per_level = self.eval_curriculum(
                    params, r,
                    data_transform(self.config, jnp.asarray(b["real"])),
                    jnp.asarray(b["known"]),
                )
                means.append(float(mean_loss))
                curves.append(np.asarray(per_level))
            mean = float(np.mean(means)) if means else float("nan")
            curve = np.mean(curves, axis=0) if curves else np.full(L, np.nan)
            results[step] = {
                "mean": mean,
                "per_level_probes": {int(t): float(curve[t]) for t in probes},
            }
            logging.info(
                "ckpt %s: curriculum test loss %.5f over %d batches (%s)",
                step, mean, len(batches),
                " ".join(f"t{t}={curve[t]:.4f}" for t in probes),
            )
        return results


class ThreeDNoiseTrainer(CurriculumTrainer):
    """Shared-cloud 3D-noise training curriculum — the debugged TPU
    re-design of the reference's experimental (bugged, undispatched)
    ``NCSNRunnerSimultaneous.train`` (ncsn_runner_simultaneous.py:73-560).
    Select with ``training.algo: simultaneous_3d``.  See
    diffusion/cloud_training.py for the per-step semantics."""

    def __init__(self, args, config):
        super().__init__(args, config)
        from ..diffusion.cloud_training import TRAINER_MODIFICATIONS, TrainerGrid

        h = cfg_get(config, "data.image_size")
        w = cfg_get(config, "data.image_width")
        self.grid3d = TrainerGrid(h, w)
        views = cfg_get(config, "training.batch_size", 8)
        mods = np.asarray(
            cfg_get(config, "data.modifications", None) or TRAINER_MODIFICATIONS
        , np.float32)
        if mods.shape[0] < views:
            reps = -(-views // mods.shape[0])
            mods = np.tile(mods, (reps, 1))
        self.mods3d = jnp.asarray(mods[:views], jnp.float32)
        if self.mesh is not None:
            from ..parallel import shard_train3d_step

            self._train3d_step = shard_train3d_step(self.train3d_step_impl, self.mesh)
        else:
            self._train3d_step = self.train3d_step

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1,))
    def train3d_step(self, state, rng, x, mask, carry, timestep):
        return self.train3d_step_impl(state, rng, x, mask, carry, timestep)

    def train3d_step_impl(self, state, rng, x, mask, carry, timestep):
        from ..diffusion.cloud_training import (
            advance_prior_cloud,
            three_d_training_images,
        )

        # origins are scaled by sigma[0] every step (:198 originList =
        # originListOG * sigmas[0])
        origins = self.mods3d * self.sigmas[0]
        img_rng, _ = jax.random.split(rng)
        images, dsm_noise, loss_mask, slot_img, fwd = three_d_training_images(
            img_rng, x, mask, carry, timestep, self.sigmas, self.grid3d, origins
        )
        labels = jnp.full((x.shape[0],), timestep, jnp.int32)

        def loss_fn(params):
            def score_fn(inp, lbl):
                return self.model.apply({"params": params}, inp, lbl)

            return anneal_dsm_score_estimation_with_mask(
                score_fn, images, labels, self.sigmas, dsm_noise, loss_mask,
                self.anneal_power,
            )

        (loss, scores), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt_state = self.optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        ema_params = (
            ema_update(state["ema_params"], params, self.ema_rate)
            if self.use_ema
            else state["ema_params"]
        )
        carry = advance_prior_cloud(
            jax.lax.stop_gradient(scores), images, loss_mask, slot_img, fwd,
            carry, self.grid3d, origins,
        )
        new_state = {"params": params, "opt_state": opt_state, "ema_params": ema_params}
        return new_state, carry, loss

    def train(self, max_steps: Optional[int] = None):
        from ..diffusion.cloud_training import init_cloud_carry

        cfg = self.config
        train_ds, test_ds = get_dataset(self.args, cfg)
        views = cfg_get(cfg, "training.batch_size", 8)
        scenes = len(train_ds) // views
        loader = BatchLoader(
            train_ds,
            batch_size=views,
            sampler=SceneBlockSampler(scenes, views, shuffle=True),
            num_workers=cfg_get(cfg, "data.num_workers", 4),
        )
        rng = jax.random.PRNGKey(getattr(self.args, "seed", 1234))
        h = cfg_get(cfg, "data.image_size")
        w = cfg_get(cfg, "data.image_width")
        c = cfg_get(cfg, "data.channels", 2)
        state = self.init_state(rng, jnp.zeros((views, c, h, w), jnp.float32))
        log_path = getattr(self.args, "log_path", None)
        metrics = MetricsLogger(log_path)
        n_iters = max_steps or cfg_get(cfg, "training.n_iters", 300001)
        snapshot_freq = cfg_get(cfg, "training.snapshot_freq", 5000)
        max_reachable = 1
        step = true_step = 0
        origins = self.mods3d * self.sigmas[0]
        t0 = time.time()
        max_seconds = cfg_get(cfg, "training.max_seconds", None)

        for epoch in range(cfg_get(cfg, "training.n_epochs", 1)):
            for batch_np in loader:
                step += 1
                x = jnp.asarray(batch_np["real"])
                mask = jnp.asarray(batch_np["known"])
                # joint random column roll of all views (:209-214)
                roll = int(np.random.randint(w))
                x = jnp.roll(x, roll, axis=-1)
                mask = jnp.roll(mask, roll, axis=-1)
                rng, init_rng = jax.random.split(rng)
                carry = init_cloud_carry(
                    init_rng, x, mask, self.grid3d, origins, self.sigmas[0]
                )
                for timestep in range(max_reachable):
                    true_step += 1
                    rng, step_rng = jax.random.split(rng)
                    state, carry, loss = self._train3d_step(
                        state, step_rng, x, mask, carry, timestep
                    )
                    if true_step % 10 == 0:
                        metrics.scalar("loss", loss, true_step)
                        logging.info(
                            "step: %d, timestep: %d, loss: %.5f",
                            step, timestep, float(loss),
                        )
                    if true_step % 20 == 0 and max_reachable < len(self.sigmas):
                        max_reachable += 1
                    if log_path and true_step % snapshot_freq == 0:
                        save_checkpoint(log_path, state, step)
                    if (
                        step >= n_iters and timestep == max_reachable - 1
                    ) or _stop_requested(log_path, t0, max_seconds):
                        if log_path:
                            save_checkpoint(log_path, state, step)
                        metrics.close()
                        return state
                if step >= n_iters or _stop_requested(log_path, t0, max_seconds):
                    if log_path:
                        save_checkpoint(log_path, state, step)
                    metrics.close()
                    return state
        if log_path:
            save_checkpoint(log_path, state, step)
        metrics.close()
        return state


class BaseTrainer(CurriculumTrainer):
    """Plain LiDARGen training: random-sigma DSM on full images, EMA test
    loss every 100 steps, ``snapshot_freq`` checkpoints and optional sample
    grids (ncsn_runner.py:42-221).  Dispatched by ``main.py`` for the
    non-simultaneous datasets (KITTI/lidar/KITTI360/nuscenes/...)."""

    def __init__(self, args, config):
        super().__init__(args, config)
        if self.mesh is not None:
            self._base_step = shard_base_step(self.base_step_impl, self.mesh)
        else:
            self._base_step = self.base_step

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=(1,))
    def base_step(self, state, rng, x):
        return self.base_step_impl(state, rng, x)

    def base_step_impl(self, state, rng, x):
        def loss_fn(params):
            def score_fn(inp, lbl):
                return self.model.apply({"params": params}, inp, lbl)

            return anneal_dsm_score_estimation(
                score_fn, rng, x, self.sigmas, anneal_power=self.anneal_power
            )

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = self.optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        ema_params = (
            ema_update(state["ema_params"], params, self.ema_rate)
            if self.use_ema
            else state["ema_params"]
        )
        return {"params": params, "opt_state": opt_state, "ema_params": ema_params}, loss

    @functools.partial(jax.jit, static_argnums=0)
    def base_eval_step(self, params, rng, x):
        """Test DSM loss with the EMA copy (ncsn_runner.py:142-166)."""

        def score_fn(inp, lbl):
            return self.model.apply({"params": params}, inp, lbl)

        return anneal_dsm_score_estimation(
            score_fn, rng, x, self.sigmas, anneal_power=self.anneal_power
        )

    def train(self, max_steps: Optional[int] = None):
        cfg = self.config
        train_ds, test_ds = get_dataset(self.args, cfg)
        b = cfg_get(cfg, "training.batch_size", 8)
        loader = BatchLoader(
            train_ds,
            batch_size=b,
            shuffle=True,
            num_workers=cfg_get(cfg, "data.num_workers", 4),
        )
        test_loader = BatchLoader(test_ds, batch_size=b, shuffle=True, num_workers=2)
        rng = jax.random.PRNGKey(getattr(self.args, "seed", 1234))
        h = cfg_get(cfg, "data.image_size")
        # square image datasets (CIFAR10/CELEBA) carry no image_width key
        w = cfg_get(cfg, "data.image_width", None) or h
        c = cfg_get(cfg, "data.channels", 2)
        state = self.init_state(rng, jnp.zeros((b, c, h, w), jnp.float32))
        log_path = getattr(self.args, "log_path", None)
        step = 0
        if getattr(self.args, "resume_training", False) and log_path:
            if os.path.isdir(os.path.join(log_path, "ckpt")):
                try:
                    state = restore_checkpoint(log_path, target=state)
                    prog = load_progress(log_path)
                    if prog is not None:
                        step = int(prog["step"])
                    logging.info("resumed from %s/ckpt (step %d)", log_path, step)
                except Exception as exc:  # pragma: no cover
                    logging.warning("resume failed (%s); training fresh", exc)
        metrics = MetricsLogger(log_path)
        n_iters = max_steps or cfg_get(cfg, "training.n_iters", 300001)
        snapshot_freq = cfg_get(cfg, "training.snapshot_freq", 5000)
        test_iter = iter(test_loader)
        t0 = time.time()
        max_seconds = cfg_get(cfg, "training.max_seconds", None)

        def progress():
            return {"step": step}
        for epoch in range(cfg_get(cfg, "training.n_epochs", 1)):
            for batch_np in loader:
                step += 1
                rng, r, tr = jax.random.split(rng, 3)
                # tr drives uniform/gaussian dequantization when the config
                # asks for it (ncsn_original.yml), like the reference's
                # runner-side data_transform
                x = data_transform(cfg, jnp.asarray(batch_np["real"]), tr)
                state, loss = self._base_step(state, r, x)
                if step % 10 == 0:
                    metrics.scalar("loss", loss, step)
                    logging.info("step: %d, loss: %.5f", step, float(loss))
                if step % 100 == 0:
                    try:
                        tb = next(test_iter)
                    except StopIteration:
                        test_iter = iter(test_loader)
                        tb = next(test_iter)
                    rng, er, tr2 = jax.random.split(rng, 3)
                    params = state["ema_params"] if self.use_ema else state["params"]
                    tl = self.base_eval_step(
                        params, er, data_transform(cfg, jnp.asarray(tb["real"]), tr2)
                    )
                    metrics.scalar("test_loss", tl, step)
                    logging.info("step: %d, test_loss: %.5f", step, float(tl))
                if log_path and step % snapshot_freq == 0:
                    save_checkpoint(log_path, state, step, progress())
                    if cfg_get(cfg, "training.snapshot_sampling", False):
                        self._snapshot_sample(state, rng, step, log_path)
                if step >= n_iters or _stop_requested(log_path, t0, max_seconds):
                    if log_path:
                        save_checkpoint(log_path, state, step, progress())
                    metrics.close()
                    return state
        if log_path:
            save_checkpoint(log_path, state, step, progress())
        metrics.close()
        return state
