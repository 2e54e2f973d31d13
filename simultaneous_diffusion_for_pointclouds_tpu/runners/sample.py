"""Sampling runners: the progressive-ablation simultaneous sampling flow.

Reproduces ``NCSNRunnerKITTISimultaneous.sample`` (reference
ncsn_runner_kitti_simultaneous.py:461-900) and its AllForOne/Completion
siblings: load the (pretrained) score net with EMA weights, build the
sensor-reliability mask, iterate scene batches, and for each run the
``doThis`` ablation — joint denoising with 2..A views per scene, then the
plain per-view inpainting baseline — saving reference-compatible outputs:

  toWorld_{ids}.npy / fromWorld_{ids}.npy
  {doThis}_{ids}_Input/GT/SKY_*.npy            (doThis == 0 only)
  {doThis}_{ids}_Masked_completion_{ckpt}.pth.npy
  {doThis}_{ids}_TimeTaken.npy
  {doThis}_{batch}_*_image_grid_{ckpt}.png

Wall-clock per variant is accumulated exactly like the reference's
``timeTaken`` instrumentation (:526,704-772) — this is the benchmark hook.

The jitted sampler programs (and the ladder-segment chunking they share)
live in :mod:`runners.chunking`; this module holds the data/file flows.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import cfg_get
from ..data.loader import BatchLoader, SceneBlockSampler
from ..data.registry import get_dataset
from ..data.transforms import inverse_data_transform
from ..diffusion.consistency import effective_origins
from ..diffusion.langevin import LangevinConfig
from ..diffusion.sigmas import get_sigmas
from ..models import get_model
from ..ops.geometry import kitti_sampler_grid
from ..parallel import maybe_mesh
from ..utils.checkpoint import load_score_params
from ..utils.images import save_sample_grid, two_channel_to_tiles
from .chunking import SamplerPrograms


# The reference's only checked-in data fixture: per-pixel return counts used
# to mask unreliable sensor pixels (MeasureResults/existTotalLiDARGenSettings
# .npy, consumed at ncsn_runner_kitti_simultaneous.py:527).  The runner tries
# the reference's /data path first, then this fixture, so sampling on this
# box uses the real mask rather than silently falling back to all-ones.
EXIST_MASK_FALLBACKS = (
    "/data/existTotalLiDARGenSettings.npy",
    "/root/reference/MeasureResults/existTotalLiDARGenSettings.npy",
)


def build_exist_mask(path: Optional[str], batch: int, rows: int, cols: int) -> np.ndarray:
    """Sensor-failure mask from pixel-return counts
    (ncsn_runner_kitti_simultaneous.py:527-533): threshold at max/3, then
    4 erosion iterations below row 2 (border_value=1).  All-ones only when
    neither the given path nor any fallback fixture exists (logged)."""
    candidates = [path] if path else []
    candidates += [p for p in EXIST_MASK_FALLBACKS if p != path]
    found = next((p for p in candidates if p and os.path.isfile(p)), None)
    if found:
        import scipy.ndimage

        vals = np.load(found)
        if vals.shape != (rows, cols):
            logging.warning(
                "exist-mask fixture %s has shape %s, want (%d, %d); using all-ones",
                found, vals.shape, rows, cols,
            )
            mask = np.ones((rows, cols), dtype=bool)
        else:
            mask = vals > np.max(vals) / 3
            mask[2:] = scipy.ndimage.binary_erosion(
                mask[2:], border_value=1, iterations=4
            )
    else:
        logging.warning("no exist-mask fixture found (tried %s); using all-ones", candidates)
        mask = np.ones((rows, cols), dtype=bool)
    return np.tile(mask[None], (batch, 1, 1)).astype(np.float32)


class SimultaneousSamplingRunner(SamplerPrograms):
    """variant="poses" -> Line/8batch (pose matrices); variant="offsets" ->
    AllForOne / Completion (per-view origin offsets)."""

    def __init__(self, args, config, variant: str = "poses"):
        self.args = args
        self.config = config
        self.variant = variant
        self.rows = cfg_get(config, "data.image_size", 64)
        # square image datasets (CIFAR10/CELEBA) carry no image_width key
        self.cols = cfg_get(config, "data.image_width", None) or self.rows
        self.channels = cfg_get(config, "data.channels", 2)
        self.views = cfg_get(config, "sampling.actualBatchSize", 7)
        self.batch = cfg_get(config, "sampling.batch_size", 42)
        self.groups = self.batch // self.views
        # Sampling default is a bfloat16 trunk (params/outputs stay f32):
        # -11% step time for a 0.2% MAE delta on the trained flagship model
        # (PERF_NOTES round-4 bf16 table).  Configs still pin either dtype
        # via model.compute_dtype; training keeps the f32 default.
        pinned_dtype = cfg_get(config, "model.compute_dtype", None)
        if pinned_dtype is None:
            self.model = get_model(config, dtype=jnp.bfloat16)
            logging.info(
                "model.compute_dtype unset -> sampling trunk defaults to bfloat16"
            )
        else:
            self.model = get_model(config)
            logging.info("sampling trunk compute_dtype: %s", pinned_dtype)
        self.sigmas = get_sigmas(config)
        self.grid = kitti_sampler_grid(self.rows, self.cols)

        # reference-hardcoded hyperparameters, overridable via config
        self.start_step = cfg_get(config, "sampling.start_step", 2)
        self.correlation_co = cfg_get(config, "sampling.correlation_coefficient", 0.01)
        self.grad_ref = cfg_get(config, "sampling.grad_ref", 1.0)
        self.allowance = cfg_get(config, "sampling.allowance", 10.0)
        self.setting = cfg_get(
            config, "sampling.setting", 5 if variant == "poses" else 7
        )
        # final_only: false keeps every noise level's state (reference
        # ncsn_runner.py:505-516): one frame per LEVEL here (the reference
        # keeps one per inner step — 5x more frames of the same movie).
        # The (L, B, C, H, W) trajectory lives on-device until the sampler
        # returns; use it with small ladders / batches.
        self.final_only = bool(cfg_get(config, "sampling.final_only", True))
        # memory knobs for batches beyond single-chip HBM (CLAUDE.md):
        # sequential_groups processes one scene group at a time inside the
        # merge; score_chunks lax.maps the score forward over sub-batches
        self.sequential_groups = bool(cfg_get(config, "sampling.sequential_groups", False))
        self.score_chunks = int(cfg_get(config, "sampling.score_chunks", 1))
        # Ladder execution chunking: single device executions beyond ~60 s
        # die (axon tunnel per-execute ceiling) — ladders are auto-split
        # into ~35 s segments sized by batch and pixel count
        # (langevin.ladder_segments; sampling.exec_level_chunks overrides,
        # 1 = single execution).  Chunked == unchunked bitwise: noise keys
        # and the correlation schedule use absolute level indices.
        self.exec_level_chunks = int(
            cfg_get(config, "sampling.exec_level_chunks", 0)
        )
        # diagnosis mode: per-segment wall-clock + per-variant device memory
        # stats (the round-3 B=42 in-process slowdown investigation)
        self.segment_timing = bool(cfg_get(config, "sampling.segment_timing", False))
        # mitigation knob: drop every cached jit program between ablation
        # variants (fresh executables + freed device buffers per variant, at
        # recompile cost) — for long multi-executable processes where the
        # round-3 in-process slowdown appears
        self.evict_executables = bool(
            cfg_get(config, "sampling.evict_executables", False)
        )
        self.lcfg = LangevinConfig(
            n_steps_each=cfg_get(config, "sampling.n_steps_each", 5),
            step_lr=cfg_get(config, "sampling.step_lr", 6.2e-6),
            denoise=cfg_get(config, "sampling.denoise", True),
            collect_levels=not self.final_only,
        )
        # Multi-device by default (``parallel.enable``, auto when >1 device):
        # every sampler jit below goes through the (data, view) mesh, the TPU
        # counterpart of the reference's nn.DataParallel on every sampling
        # path (ncsn_runner_kitti_simultaneous.py:481).
        self.mesh = maybe_mesh(config)
        if self.mesh is not None:
            logging.info("sampling over mesh %s", self.mesh)

    # ------------------------------------------------------------------
    def load_params(self, ckpt_path: Optional[str] = None, rng=None):
        ckpt_path = ckpt_path or cfg_get(self.config, "sampling.ckpt_path", None)
        example = jnp.zeros((1, self.channels, self.rows, self.cols), jnp.float32)
        labels = jnp.zeros((1,), jnp.int32)
        if ckpt_path and os.path.exists(ckpt_path):
            logging.info("loading checkpoint %s", ckpt_path)
            return load_score_params(ckpt_path, self.model, example, labels)
        logging.warning("no checkpoint found (%s); using random init", ckpt_path)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        return self.model.init(rng, example, labels)["params"]

    # ------------------------------------------------------------------
    def _subset_views(self, arr: np.ndarray, keep: int) -> np.ndarray:
        """First ``keep`` of every scene's views (reference :717-739)."""
        shaped = arr.reshape((self.groups, self.views) + arr.shape[1:])
        return shaped[:, :keep].reshape((self.groups * keep,) + arr.shape[1:])

    def _ablation_plan(self):
        """The ``doThis`` progression per runner family.

        - poses/Line (ncsn_runner_kitti_simultaneous.py:549,707-758):
          doThis 0..A-1; <A-2 joint with doThis+2 views, ==A-2 joint with all
          A views, ==A-1 plain inpainting on the FULL batch.
        - offsets/AllForOne (ncsn_runner_AllForOne.py:548-560,715-750):
          same joint progression but the baseline is plain inpainting on ONE
          view per scene; with the densification dataset the loop narrows to
          [full joint, 1-view baseline].
        Returns a list of ("joint", keep_views) / ("baseline", keep_views).
        ``sampling.plan`` narrows the progression: "full" (default, the
        reference's doThis loop), "joint_baseline" (full joint + baseline
        only), "joint_only" (full joint only — e.g. the bf16 evidence pair).
        """
        A = self.views
        dataset = cfg_get(self.config, "data.dataset", "")
        plan_mode = cfg_get(self.config, "sampling.plan", "full")
        if plan_mode == "joint_only":
            return [("joint", A)]
        if plan_mode == "joint_baseline":
            return [
                ("joint", A),
                ("baseline", A if self.variant == "poses" else 1),
            ]
        if plan_mode != "full":
            raise NotImplementedError(
                f"sampling.plan {plan_mode!r} not in ('full', 'joint_baseline', 'joint_only')"
            )
        if self.variant == "poses":
            plan = [("joint", min(d + 2, A)) for d in range(A - 1)]
            plan.append(("baseline", A))
            return plan
        if dataset == "KITTI360_im_simultaneous_densification":
            return [("joint", A), ("baseline", 1)]
        plan = [("joint", min(d + 2, A)) for d in range(A - 1)]
        plan.append(("baseline", 1))
        return plan

    def sample(self, max_batches: Optional[int] = None, ckpt_path=None, seed=1234):
        cfg = self.config
        args = self.args
        os.makedirs(args.image_folder, exist_ok=True)
        params = self.load_params(ckpt_path)

        _, test_ds = get_dataset(args, cfg)
        n_scenes = len(test_ds) // self.views
        # exclude trailing scenes that lack forward ground truth (:506-510)
        n_scenes = max(1, n_scenes - 5)
        loader = BatchLoader(
            test_ds,
            batch_size=self.batch,
            sampler=SceneBlockSampler(n_scenes, self.views, shuffle=False),
            num_workers=cfg_get(cfg, "data.num_workers", 4),
        )

        exist = build_exist_mask(
            cfg_get(cfg, "sampling.exist_mask_path", "/data/existTotalLiDARGenSettings.npy"),
            self.batch, self.rows, self.cols,
        )
        ckpt_id = cfg_get(cfg, "sampling.ckpt_id", 0)
        rng = jax.random.PRNGKey(seed)
        time_taken = np.zeros(len(self._ablation_plan()))

        for batch_idx, batch_np in enumerate(loader):
            if max_batches is not None and batch_idx >= max_batches:
                break
            if "scan_id" in batch_np:
                ids = batch_np["scan_id"].reshape(self.groups, self.views)[:, 0]
                save_num = "".join(str(int(i)) + "_" for i in ids)
            else:  # SceneCompletion items carry scan names
                names = np.asarray(batch_np["scan_name"]).reshape(
                    self.groups, self.views
                )[:, 0]
                save_num = "".join(str(n) + "_" for n in names)

            identity = np.tile(np.eye(4, dtype=np.float32), (self.batch, 1, 1))
            np.save(
                os.path.join(args.image_folder, f"toWorld_{save_num}"),
                batch_np.get("to_world", identity),
            )
            np.save(
                os.path.join(args.image_folder, f"fromWorld_{save_num}"),
                batch_np.get("to_og_view", identity),
            )

            refer_full = batch_np["real"].astype(np.float32)
            mask_full = batch_np["known"].astype(np.float32)
            sky_full = batch_np["sky"].astype(np.float32)
            goal_full = batch_np.get("goal", refer_full).astype(np.float32)

            # inputs / GT / sky saved once per batch (:659-696)
            inp = np.asarray(
                inverse_data_transform(cfg, jnp.asarray(refer_full * mask_full))
            )
            np.save(
                os.path.join(
                    args.image_folder, f"0_{save_num}_Input_completion_{ckpt_id}.pth"
                ),
                two_channel_to_tiles(inp),
            )
            save_sample_grid(
                inp,
                os.path.join(
                    args.image_folder, f"0_{batch_idx}_Input_image_grid_{ckpt_id}.png"
                ),
                int(np.sqrt(self.batch)),
            )
            gt = np.asarray(inverse_data_transform(cfg, jnp.asarray(goal_full)))
            np.save(
                os.path.join(
                    args.image_folder, f"0_{save_num}_GT_completion_{ckpt_id}.pth"
                ),
                two_channel_to_tiles(gt),
            )
            save_sample_grid(
                gt,
                os.path.join(
                    args.image_folder, f"0_{batch_idx}_GT_image_grid_{ckpt_id}.png"
                ),
                int(np.sqrt(self.batch)),
            )
            np.save(
                os.path.join(args.image_folder, f"0_{save_num}_SKY_{ckpt_id}.pth"),
                sky_full,
            )

            # per-scan origins for the Completion family, else config
            # modifications; both pass through the reference's origin
            # rescaling quirk inside the offsets sampler
            # (ncsn_runner_Completion.py:527 vs ncsn_runner_AllForOne.py:648).
            if "origins" in batch_np:
                raw_origins = batch_np["origins"][0][: self.views]
            else:
                raw_origins = np.asarray(
                    cfg_get(cfg, "data.modifications", [[0, 0, 0]])
                )[: self.views]
            origins = jnp.asarray(effective_origins(raw_origins), jnp.float32)

            # sampling.plan_start resumes an interrupted ablation: variants
            # below it are skipped (their outputs already on disk) while the
            # rng stream and doThis file numbering stay identical to a full
            # run, so the resumed variants produce the same samples they
            # would have in one process.
            plan_start = int(cfg_get(cfg, "sampling.plan_start", 0))
            for do_this, (kind, keep) in enumerate(self._ablation_plan()):
                rng, sample_rng = jax.random.split(rng)
                if do_this < plan_start:
                    continue
                init = jax.random.uniform(
                    sample_rng,
                    (self.batch, self.channels, self.rows, self.cols),
                    jnp.float32,
                )
                start = time.time()
                if kind == "joint" and cfg_get(cfg, "sampling.method", "basic") == "second":
                    x0 = self._subset_views(np.asarray(init), keep)
                    second_args = [
                        params, sample_rng, jnp.asarray(x0),
                        jnp.asarray(self._subset_views(refer_full, keep)),
                        jnp.asarray(self._subset_views(mask_full, keep)),
                        jnp.asarray(
                            self._subset_views(
                                batch_np.get(
                                    "index",
                                    -np.ones(
                                        (self.batch, 1, self.rows, self.cols),
                                        np.float32,
                                    ),
                                ),
                                keep,
                            )
                        ),
                        jnp.tile(origins[:keep], (self.groups, 1)),
                        jnp.tile(
                            jnp.asarray(raw_origins, jnp.float32)[:keep],
                            (self.groups, 1),
                        ),
                    ]
                    if self.variant == "poses":
                        second_args += [
                            jnp.asarray(
                                self._subset_views(
                                    batch_np.get("to_world", identity), keep
                                )
                            ),
                            jnp.asarray(
                                self._subset_views(
                                    batch_np.get("from_world", identity), keep
                                )
                            ),
                        ]
                    out = self._jit_second_method(keep)(*second_args)
                    n_out = self.groups * keep
                elif kind == "baseline":
                    x0 = self._subset_views(np.asarray(init), keep)
                    out = self._jit_inpainting()(
                        params, sample_rng, jnp.asarray(x0),
                        jnp.asarray(self._subset_views(refer_full, keep)),
                        jnp.asarray(self._subset_views(mask_full, keep)),
                    )
                    n_out = self.groups * keep
                else:
                    x0 = self._subset_views(np.asarray(init), keep)
                    out = self._jit_simultaneous(keep)(
                        params, sample_rng,
                        jnp.asarray(x0),
                        jnp.asarray(self._subset_views(refer_full, keep)),
                        jnp.asarray(self._subset_views(mask_full, keep)),
                        jnp.asarray(self._subset_views(sky_full, keep)),
                        jnp.asarray(self._subset_views(exist, keep)),
                        jnp.asarray(
                            self._subset_views(batch_np.get("to_world", identity), keep)
                        ),
                        jnp.asarray(
                            self._subset_views(batch_np.get("from_world", identity), keep)
                        ),
                        origins[:keep],
                    )
                    n_out = self.groups * keep
                trajectory = None
                if isinstance(out, tuple):  # collect_levels (final_only: false)
                    out, trajectory = out
                out = np.asarray(jax.block_until_ready(out))
                time_taken[do_this] += time.time() - start
                np.save(
                    os.path.join(
                        args.image_folder, f"{do_this}_{save_num}_TimeTaken.npy"
                    ),
                    time_taken[do_this],
                )
                if trajectory is not None:
                    # one frame per level + the denoised final, for the
                    # step-movie flow (reference ncsn_runner.py:505-516 +
                    # visualization.py:67-109)
                    traj = np.concatenate([np.asarray(trajectory), out[None]])
                    for lvl, frame in enumerate(traj):
                        np.save(
                            os.path.join(
                                args.image_folder,
                                f"{do_this}_{save_num}_samples_{lvl}.pth",
                            ),
                            np.asarray(
                                inverse_data_transform(cfg, jnp.asarray(frame))
                            ),
                        )

                sample = np.asarray(inverse_data_transform(cfg, jnp.asarray(out)))
                np.save(
                    os.path.join(
                        args.image_folder,
                        f"{do_this}_{save_num}_Masked_completion_{ckpt_id}.pth",
                    ),
                    two_channel_to_tiles(sample),
                )
                save_sample_grid(
                    sample,
                    os.path.join(
                        args.image_folder,
                        f"{do_this}_{batch_idx}_Masked_image_grid_{ckpt_id}.png",
                    ),
                    int(np.sqrt(n_out)),
                )
                logging.info(
                    "batch %d variant %d: %.2fs (avg %.2fs)",
                    batch_idx, do_this, time.time() - start,
                    time_taken[do_this] / (batch_idx + 1),
                )
                if self.evict_executables:
                    self._jit_simultaneous.cache_clear()
                    self._jit_second_method.cache_clear()
                    self._jit_inpainting.cache_clear()
                    jax.clear_caches()
                if self.segment_timing:
                    try:
                        stats = jax.local_devices()[0].memory_stats() or {}
                        logging.info(
                            "[memstats] variant %d: in_use=%.0fMB peak=%.0fMB "
                            "largest_free=%.0fMB num_allocs=%s",
                            do_this,
                            stats.get("bytes_in_use", 0) / 1e6,
                            stats.get("peak_bytes_in_use", 0) / 1e6,
                            stats.get("largest_free_block_bytes", 0) / 1e6,
                            stats.get("num_allocs", "?"),
                        )
                    except Exception as exc:  # backend-dependent
                        logging.info("[memstats] unavailable: %s", exc)
        return time_taken

    # ------------------------------------------------------------------
    def hyperparameter_grid_sample(self, max_batches: Optional[int] = 2, ckpt_path=None, seed=0):
        cfg = self.config
        args = self.args
        os.makedirs(args.image_folder, exist_ok=True)
        params = self.load_params(ckpt_path)
        _, test_ds = get_dataset(args, cfg)
        loader = BatchLoader(
            test_ds, batch_size=self.batch,
            sampler=SceneBlockSampler(len(test_ds) // self.views, self.views, shuffle=False),
            num_workers=2,
        )
        exist = build_exist_mask(
            cfg_get(cfg, "sampling.exist_mask_path", None),
            self.batch, self.rows, self.cols,
        )
        origins = jnp.asarray(
            effective_origins(cfg_get(cfg, "data.modifications", [[0, 0, 0]])),
            jnp.float32,
        )[: self.views]
        rng = jax.random.PRNGKey(seed)
        results = {}
        sampler = self._jit_grid(self.views)
        for batch_idx, batch_np in enumerate(loader):
            if max_batches is not None and batch_idx >= max_batches:
                break
            for v_idx, (corr, gref) in enumerate(self.GRID_VARIANTS):
                rng, srng = jax.random.split(rng)
                init = jax.random.uniform(
                    srng, (self.batch, self.channels, self.rows, self.cols), jnp.float32
                )
                out = sampler(
                    params, srng, init,
                    jnp.asarray(batch_np["real"], jnp.float32),
                    jnp.asarray(batch_np["known"], jnp.float32),
                    jnp.asarray(batch_np["sky"], jnp.float32),
                    jnp.asarray(exist),
                    origins,
                    jnp.float32(corr), jnp.float32(gref),
                )
                out = np.asarray(out)
                np.save(
                    os.path.join(
                        args.image_folder,
                        f"grid{v_idx}_{batch_idx}_completion.npy",
                    ),
                    two_channel_to_tiles(np.asarray(inverse_data_transform(cfg, jnp.asarray(out)))),
                )
                results[(v_idx, batch_idx)] = out
        return results

    # ------------------------------------------------------------------
    def plain_sample(self, ckpt_path=None, seed=1234):
        """Unconditional sampling with ``final_only`` trajectory dumps —
        the reference base runner's sample() branch (ncsn_runner.py:505-533):
        ``final_only: true`` saves samples.pth(.npy) + image_grid.png;
        false saves samples_{i}.pth(.npy) + image_grid_{i}.png per noise
        level (one frame per LEVEL here plus the denoised final; the
        reference keeps one per inner step), ready for
        eval.visualization.render_step_movie.  Supports ``sampling.data_init``
        (init from a test batch + sigma_0 noise, ncsn_runner.py:484-494)."""

        cfg = self.config
        args = self.args
        os.makedirs(args.image_folder, exist_ok=True)
        params = self.load_params(ckpt_path)
        b = self.batch
        lcfg = self.lcfg
        sampler = self._plain_sampler(lcfg, b)
        rng = jax.random.PRNGKey(seed)
        if cfg_get(cfg, "sampling.data_init", False):
            from ..data.transforms import data_transform

            _, test_ds = get_dataset(args, cfg)
            loader = BatchLoader(test_ds, batch_size=b, shuffle=True, num_workers=2)
            batch_np = next(iter(loader))
            init = data_transform(cfg, jnp.asarray(batch_np["real"], jnp.float32))
            rng, nrng = jax.random.split(rng)
            init = init + self.sigmas[0] * jax.random.normal(nrng, init.shape, init.dtype)
        else:
            init = jax.random.uniform(
                rng, (b, self.channels, self.rows, self.cols), jnp.float32
            )
        out = sampler(params, rng, init)
        grid_side = int(np.sqrt(b))
        if lcfg.collect_levels:
            out, trajectory = out
            frames = np.concatenate(
                [np.asarray(trajectory), np.asarray(out)[None]]
            )
            for i, frame in enumerate(frames):
                sample = np.asarray(inverse_data_transform(cfg, jnp.asarray(frame)))
                np.save(
                    os.path.join(args.image_folder, f"samples_{i}.pth"), sample
                )
                save_sample_grid(
                    sample,
                    os.path.join(args.image_folder, f"image_grid_{i}.png"),
                    grid_side,
                )
            return len(frames)
        sample = np.asarray(inverse_data_transform(cfg, jnp.asarray(out)))
        np.save(os.path.join(args.image_folder, "samples.pth"), sample)
        save_sample_grid(
            sample, os.path.join(args.image_folder, "image_grid.png"), grid_side
        )
        return 1

    # ------------------------------------------------------------------
    def fast_fid(self, ckpt_path=None, seed=0):
        """Unconditional batch sampling + distribution-distance metrics
        (config section fast_fid).  The reference's dispatch is broken —
        main.py:202-203 calls a ``fast_fid()`` no runner defines — so the
        metric here is the LiDARGen paper's simpler pair: JSD and MMD^2
        over birds-eye-view histograms vs the test set
        (:mod:`eval.distribution`), written to ``fid_metrics.json``."""

        cfg = self.config
        args = self.args
        os.makedirs(args.image_folder, exist_ok=True)
        params = self.load_params(ckpt_path)
        n = cfg_get(cfg, "fast_fid.num_samples", 64)
        bs = min(cfg_get(cfg, "fast_fid.batch_size", 16), n)
        lcfg = LangevinConfig(
            n_steps_each=cfg_get(cfg, "fast_fid.n_steps_each", 5),
            step_lr=cfg_get(cfg, "fast_fid.step_lr", 6.2e-6),
            denoise=cfg_get(cfg, "sampling.denoise", True),
        )
        sampler = self._plain_sampler(lcfg, bs)
        rng = jax.random.PRNGKey(seed)
        done = 0
        samples = []
        while done < n:
            rng, srng = jax.random.split(rng)
            init = jax.random.uniform(
                srng, (bs, self.channels, self.rows, self.cols), jnp.float32
            )
            out = np.asarray(
                inverse_data_transform(cfg, sampler(params, srng, init))
            )
            for i in range(bs):
                np.save(os.path.join(args.image_folder, f"fid_{done + i}.npy"), out[i])
                samples.append(out[i])
            done += bs

        if not cfg_get(cfg, "fast_fid.compute_metric", True):
            return done
        import json

        from ..eval.distribution import distribution_metrics

        _, test_ds = get_dataset(args, cfg)
        references = [
            np.asarray(test_ds[i]["real"], np.float32)
            for i in range(min(n, len(test_ds)))
        ]
        metrics = distribution_metrics(
            samples[:n], references,
            bins=cfg_get(cfg, "fast_fid.bev_bins", 100),
            extent=cfg_get(cfg, "fast_fid.bev_extent", 64.0),
        )
        text = json.dumps(metrics, indent=2)
        with open(os.path.join(args.image_folder, "fid_metrics.json"), "w") as f:
            f.write(text)
        logging.info("fast_fid metrics: %s", text)
        print(text)
        return metrics
