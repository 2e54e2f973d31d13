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

from ..config import cfg_get
from ..data.loader import BatchLoader, SceneBlockSampler
from ..data.registry import get_dataset
from ..data.transforms import inverse_data_transform
from ..diffusion.consistency import ConsistencyConfig, effective_origins
from ..diffusion.langevin import (
    LangevinConfig,
    anneal_langevin_inpainting,
    simultaneous_inpainting_sample,
)
from ..diffusion.sigmas import get_sigmas
from ..models import get_model
from ..ops.geometry import kitti_sampler_grid
from ..utils.checkpoint import load_score_params
from ..utils.images import save_sample_grid, two_channel_to_tiles
from ..utils.logging_utils import setup_logging


def build_exist_mask(path: Optional[str], batch: int, rows: int, cols: int) -> np.ndarray:
    """Sensor-failure mask from pixel-return counts
    (ncsn_runner_kitti_simultaneous.py:527-533): threshold at max/3, then
    4 erosion iterations below row 2.  All-ones when no fixture exists."""
    if path and os.path.isfile(path):
        import scipy.ndimage

        vals = np.load(path)
        mask = vals > np.max(vals) / 3
        mask[2:] = scipy.ndimage.binary_erosion(
            mask[2:], border_value=1, iterations=4
        )
    else:
        mask = np.ones((rows, cols), dtype=bool)
    return np.tile(mask[None], (batch, 1, 1)).astype(np.float32)


class SimultaneousSamplingRunner:
    """variant="poses" -> Line/8batch (pose matrices); variant="offsets" ->
    AllForOne / Completion (per-view origin offsets)."""

    def __init__(self, args, config, variant: str = "poses"):
        self.args = args
        self.config = config
        self.variant = variant
        self.rows = cfg_get(config, "data.image_size", 64)
        self.cols = cfg_get(config, "data.image_width", 1024)
        self.channels = cfg_get(config, "data.channels", 2)
        self.views = cfg_get(config, "sampling.actualBatchSize", 7)
        self.batch = cfg_get(config, "sampling.batch_size", 42)
        self.groups = self.batch // self.views
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            cfg_get(config, "model.compute_dtype", "float32")
        ]
        self.model = get_model(config, dtype=dtype)
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
        self.lcfg = LangevinConfig(
            n_steps_each=cfg_get(config, "sampling.n_steps_each", 5),
            step_lr=cfg_get(config, "sampling.step_lr", 6.2e-6),
            denoise=cfg_get(config, "sampling.denoise", True),
        )

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

    def _score_fn(self, params):
        def score(x, labels):
            return self.model.apply({"params": params}, x, labels)

        return score

    # two jitted entry points, cached per views-count ------------------
    @functools.lru_cache(maxsize=16)
    def _jit_simultaneous(self, views: int):
        ccfg = ConsistencyConfig(
            grid=self.grid,
            actual_batch_size=views,
            setting=self.setting,
            allowance=float(self.allowance),
            variant=self.variant,
        )

        def run(params, rng, x, refer, mask, sky, exist, origins, to_world, from_world):
            kw = (
                dict(origins=origins)
                if self.variant == "offsets"
                else dict(to_world=to_world, from_world=from_world)
            )
            return simultaneous_inpainting_sample(
                rng, x, self._score_fn(params), self.sigmas, self.lcfg, ccfg,
                refer_image=refer, refer_mask=mask, sky=sky, exist_mask=exist,
                min_step_to_share=self.start_step, grad_ref=self.grad_ref,
                correlation_coefficient=self.correlation_co, **kw,
            )

        return jax.jit(run)

    @functools.lru_cache(maxsize=4)
    def _jit_inpainting(self):
        def run(params, rng, x, refer, mask):
            return anneal_langevin_inpainting(
                rng, x, refer, mask, self._score_fn(params), self.sigmas,
                self.lcfg, grad_ref=1.0,
            )

        return jax.jit(run)

    # ------------------------------------------------------------------
    def _subset_views(self, arr: np.ndarray, keep: int) -> np.ndarray:
        """First ``keep`` of every scene's views (reference :717-739)."""
        shaped = arr.reshape((self.groups, self.views) + arr.shape[1:])
        return shaped[:, :keep].reshape((self.groups * keep,) + arr.shape[1:])

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
        time_taken = np.zeros(self.views)

        for batch_idx, batch_np in enumerate(loader):
            if max_batches is not None and batch_idx >= max_batches:
                break
            ids = batch_np["scan_id"].reshape(self.groups, self.views)[:, 0]
            save_num = "".join(str(int(i)) + "_" for i in ids)

            np.save(
                os.path.join(args.image_folder, f"toWorld_{save_num}"),
                batch_np["to_world"],
            )
            np.save(
                os.path.join(args.image_folder, f"fromWorld_{save_num}"),
                batch_np["to_og_view"],
            )

            refer_full = batch_np["real"].astype(np.float32)
            mask_full = batch_np["known"].astype(np.float32)
            sky_full = batch_np["sky"].astype(np.float32)
            goal_full = batch_np["goal"].astype(np.float32)

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

            origins = jnp.asarray(
                effective_origins(cfg_get(cfg, "data.modifications", [[0, 0, 0]])),
                jnp.float32,
            )

            for do_this in range(self.views):
                rng, sample_rng = jax.random.split(rng)
                init = jax.random.uniform(
                    sample_rng,
                    (self.batch, self.channels, self.rows, self.cols),
                    jnp.float32,
                )
                start = time.time()
                if do_this == self.views - 1:
                    # plain per-view inpainting baseline (:707-716)
                    out = self._jit_inpainting()(
                        params, sample_rng, init, jnp.asarray(refer_full),
                        jnp.asarray(mask_full),
                    )
                    n_out = self.batch
                else:
                    keep = min(do_this + 2, self.views)
                    x0 = self._subset_views(np.asarray(init), keep)
                    out = self._jit_simultaneous(keep)(
                        params, sample_rng,
                        jnp.asarray(x0),
                        jnp.asarray(self._subset_views(refer_full, keep)),
                        jnp.asarray(self._subset_views(mask_full, keep)),
                        jnp.asarray(self._subset_views(sky_full, keep)),
                        jnp.asarray(self._subset_views(exist, keep)),
                        origins[:keep],
                        jnp.asarray(self._subset_views(batch_np["to_world"], keep)),
                        jnp.asarray(self._subset_views(batch_np["from_world"], keep)),
                    )
                    n_out = self.groups * keep
                out = np.asarray(jax.block_until_ready(out))
                time_taken[do_this] += time.time() - start
                np.save(
                    os.path.join(
                        args.image_folder, f"{do_this}_{save_num}_TimeTaken.npy"
                    ),
                    time_taken[do_this],
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
        return time_taken
