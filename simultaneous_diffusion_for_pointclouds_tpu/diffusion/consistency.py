"""Cross-view reproject-and-merge consistency — the core of "simultaneous
diffusion", as one batched XLA program.

Reference semantics (models/__init__.py:263-579 for the offset-origin
variant; models/KITTISampling.py:160-490 for the pose-matrix variant): after
every Langevin update, each view's diffusing range image is un-logged to 3D,
all ``actual_batch_size`` views of a scene are merged into one shared cloud,
the cloud is re-projected into every view on an extended vertical grid,
colliding points are reduced per pixel (average / min / controlled average),
negative-range pixels take the flipped+rolled "opposite" pixel, and each
view is nudged toward its shared image:
``x += corr_coef * (-mask_shared * ~known * (x - shared))``.

The reference runs this as a *serialized Python loop over all 42 views*,
each iteration doing argsort + two stable sorts + unique_consecutive + three
sparse scatters.  Here the whole merge is one ``zbuffer_stats`` call over
flattened (view, row, col) segment keys — every view in parallel, no
data-dependent shapes, jit/scan-safe.

Variant differences (faithfully preserved):

===========================  =======================  =====================
behaviour                    offsets (basic)          poses (kitti)
===========================  =======================  =====================
source-pixel sky filter      ON  (:355-359)           OFF (commented, :267)
min-depth-to-trust filter    always (:363-367)        only setting==5 (:271)
controlled average           setting>=7 (:449)        always (:363-391)
allowance                    10 (5 if setting>=8)     caller-supplied
origin quirk                 log-roundtrip/(o+1e-8)   n/a (pose matrices)
                             *10 => sign(o)*10 !
===========================  =======================  =====================
"""

from __future__ import annotations

import dataclasses
import functools
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import (
    RangeGrid,
    crop_big_with_negatives,
    log_compress,
    project_bins_soa,
    signed_log_decompress,
    unproject_soa,
)
from ..ops.scatter import (
    zbuffer_stats_sorted as zbuffer_stats,
    zbuffer_stats_sorted_batched,
    zbuffer_stats_sorted_batched_dense,
    zbuffer_stats_sorted_batched_gather,
)


def effective_origins(modifications: np.ndarray) -> np.ndarray:
    """The reference's origin rescaling quirk (models/__init__.py:224-231).

    ``o -> (2^(6 * log2(|o|+1)/6) - 1) / (o + 1e-8) * 10``, i.e. ~``|o|/o*10``:
    every nonzero offset component collapses to +/-10 metres regardless of
    magnitude, and zeros stay ~0.  Preserved because the shipped behaviour
    (and any tuned hyperparameters) depend on it.
    """
    o = np.asarray(modifications, dtype=np.float64)
    roundtrip = np.power(2.0, np.log2(np.abs(o) + 1.0)) - 1.0
    return roundtrip / (o + 1e-8) * 10.0


@dataclasses.dataclass(frozen=True)
class ConsistencyConfig:
    """Static knobs of the merge (hashable; safe to close over in jit)."""

    grid: RangeGrid
    actual_batch_size: int
    setting: int = 5
    allowance: float = 10.0
    variant: str = "offsets"  # "offsets" | "poses"
    too_high_threshold: float = 50.0
    min_depth_to_trust: float = 0.2  # metres
    # process scene groups one at a time (lax.map) instead of batched:
    # ~G-fold lower peak HBM for the merge, enabling the reference's
    # 42-image batch on a 16 GB chip at a small wall-clock cost
    sequential_groups: bool = False
    # z-buffer implementation (identical results up to fp summation order):
    #   "auto" (default): "pallas" for controlled-average merges on TPU
    #     (the min-winner channels cost ~16 ms in the XLA pipeline but are
    #     free in the kernel), "sorted_batched_dense" otherwise;
    #   "pallas": ops/zbuffer_pallas.py one-hot MXU kernel;
    #   "sorted_batched_dense": sentinel-dense sort pipeline, scatter-free;
    #   "sorted_batched": sort + compaction sort + small scatters;
    #   "sorted": one flat z-buffer over (B*big*W) segments.
    merge_impl: str = "auto"

    _MERGE_IMPLS = (
        "auto", "pallas", "sorted_batched", "sorted_batched_dense",
        "sorted_batched_gather", "sorted",
    )

    @property
    def resolved_merge_impl(self) -> str:
        if self.merge_impl not in self._MERGE_IMPLS:
            raise NotImplementedError(
                f"merge_impl {self.merge_impl!r} not in {self._MERGE_IMPLS}"
            )
        if self.merge_impl == "sorted_batched_gather":
            # measured pathological on TPU (202 ms vs 38 ms for the dense
            # pipeline, PERF_NOTES "negative results"); kept selectable for
            # the equivalence sweep + profilers only
            warnings.warn(
                "merge_impl='sorted_batched_gather' is a profiling-only "
                "variant (~5x slower than 'auto' on TPU); use it only to "
                "reproduce PERF_NOTES measurements",
                stacklevel=2,
            )
        if self.merge_impl != "auto":
            return self.merge_impl
        if jax.default_backend() == "tpu":
            # Round 3: the flat-layout kernel (24.7 ms) now beats the dense
            # sort pipeline even where XLA DCEs the unused min-winner
            # channels (36.3 ms for the offsets/setting<7 merge), so pallas
            # is the auto choice for EVERY TPU merge, not just
            # controlled-average ones.
            return "pallas"
        return "sorted_batched_dense"

    @property
    def use_src_sky(self) -> bool:
        return self.variant == "offsets"

    @property
    def use_min_depth(self) -> bool:
        if self.variant == "offsets":
            return True
        return self.setting == 5

    @property
    def use_controlled_average(self) -> bool:
        if self.variant == "poses":
            return True
        return self.setting >= 7

    @property
    def effective_allowance(self) -> float:
        if self.variant == "offsets":
            return 5.0 if self.setting >= 8 else 10.0
        return self.allowance


def shared_view_images(
    x: jnp.ndarray,
    sky: jnp.ndarray,
    exist_mask: jnp.ndarray,
    cfg: ConsistencyConfig,
    sigma_mod,
    *,
    origins: Optional[jnp.ndarray] = None,
    to_world: Optional[jnp.ndarray] = None,
    from_world: Optional[jnp.ndarray] = None,
):
    """Build each view's shared-cloud image.

    Args:
      x: (B, 2, H, W) diffusing images (log depth, intensity); B = G * A.
      sky: (B, 1, H, W) float/bool not-sky mask (1 = usable).
      exist_mask: (B, H, W) or (B, 1, H, W) sensor-reliability mask.
      cfg: static merge config.
      sigma_mod: scalar (traced ok) = max(sigma, 1).
      origins: (A, 3) effective view origins — offsets variant.
      to_world/from_world: (B, 4, 4) pose matrices — poses variant.

    Returns:
      new_images: (B, 2, H, W) shared depth/intensity per view.
      mask_images: (B, 1, H, W) float mask of valid shared pixels.
      too_high: scalar bool divergence guard
        (max |log depth| * 6 / sigma_mod > 50, models/__init__.py:265).
    """
    grid = cfg.grid
    A = cfg.actual_batch_size
    B = x.shape[0]
    G = B // A
    H, W = grid.rows, grid.cols
    N = H * W
    big = grid.big_rows

    depth_log = x[:, 0]
    intensity = x[:, 1]
    exist_mask = exist_mask.reshape(B, H, W) if exist_mask.ndim == 4 else exist_mask

    dist_m, is_neg = signed_log_decompress(depth_log, sigma_mod)
    too_high = jnp.max(jnp.abs(depth_log)) * 6.0 / sigma_mod > cfg.too_high_threshold

    # 1. unproject every view to 3D -> world frame.  All geometry runs in
    # structure-of-arrays form (separate x/y/z planes): a trailing coord dim
    # of 3 would tile onto the 128-lane minor axis at 3/128 occupancy
    # whenever XLA materialises it.
    vx, vy, vz = unproject_soa(dist_m, grid)  # view frame, each (B, H, W)
    dt = vx.dtype
    if cfg.variant == "offsets":
        assert origins is not None
        origins = jnp.asarray(origins, dt)  # (A, 3)
        org_b = jnp.tile(origins, (G, 1))  # (B, 3)
        wx = vx + org_b[:, 0, None, None]
        wy = vy + org_b[:, 1, None, None]
        wz = vz + org_b[:, 2, None, None]
    else:
        assert to_world is not None and from_world is not None
        r = to_world[:, :3, :3].astype(dt)  # (B, 3, 3)
        t = to_world[:, :3, 3].astype(dt)  # (B, 3)

        def rowmul(i):
            return (
                r[:, i, 0, None, None] * vx
                + r[:, i, 1, None, None] * vy
                + r[:, i, 2, None, None] * vz
                + t[:, i, None, None]
            )

        wx, wy, wz = rowmul(0), rowmul(1), rowmul(2)

    # 2. group views into scenes: shared cloud planes (G, A*N) + intensities
    cx = wx.reshape(G, A * N)
    cy = wy.reshape(G, A * N)
    cz = wz.reshape(G, A * N)
    cloud_int = intensity.reshape(G, A * N)

    # 3. re-express the cloud in every target view's frame (G, A, A*N)
    if cfg.variant == "offsets":
        rx = cx[:, None, :] - origins[None, :, 0, None]
        ry = cy[:, None, :] - origins[None, :, 1, None]
        rz = cz[:, None, :] - origins[None, :, 2, None]
    else:
        fw = from_world.reshape(G, A, 4, 4).astype(dt)

        def relrow(i):
            return (
                fw[:, :, i, 0, None] * cx[:, None, :]
                + fw[:, :, i, 1, None] * cy[:, None, :]
                + fw[:, :, i, 2, None] * cz[:, None, :]
                + fw[:, :, i, 3, None]
            )

        rx, ry, rz = relrow(0), relrow(1), relrow(2)

    # 4. bin on the extended vertical grid
    row, col, depth_m, _ = project_bins_soa(rx, ry, rz, grid)  # (G, A, A*N)
    new_depth = log_compress(depth_m, sigma_mod)

    valid = (col > -1) & (col < W) & (row > -1) & (row < big)
    if cfg.use_src_sky:
        src_sky = sky.reshape(B, N).reshape(G, 1, A * N) > 0
        valid = valid & src_sky
    # sensor-failure positions: first A views' masks, shared by all scenes
    # (models/__init__.py:362 ``existMask[:actualBatchSize].flatten()``)
    src_exist = exist_mask[:A].reshape(1, 1, A * N) > 0
    valid = valid & src_exist
    if cfg.use_min_depth:
        min_trust = log_compress(jnp.float32(cfg.min_depth_to_trust), sigma_mod)
        valid = valid & (new_depth > min_trust)

    # 5. one batched segment reduction over (view, row, col)
    src_int = jnp.broadcast_to(cloud_int[:, None, :], (G, A, A * N))
    # Materialise the scatter operands once: without the barrier XLA fuses
    # the whole unproject/reproject chain into EACH of the five scatter
    # operands, recomputing the 4M-point trig per scatter (~70ms/step).
    merge_impl = cfg.resolved_merge_impl
    if merge_impl in (
        "sorted_batched", "sorted_batched_gather", "sorted_batched_dense",
        "pallas",
    ):
        lkeys = row * W + col  # per-target-view local pixel ids
        lkeys, new_depth, src_int, valid = jax.lax.optimization_barrier(
            (
                lkeys.reshape(B, A * N),
                new_depth.reshape(B, A * N).astype(jnp.float32),
                src_int.reshape(B, A * N).astype(jnp.float32),
                valid.reshape(B, A * N),
            )
        )
        if merge_impl == "pallas":
            from ..ops.zbuffer_pallas import zbuffer_stats_sorted_batched_pallas

            # interpreter mode off-TPU (tests on the CPU mesh)
            impl = functools.partial(
                zbuffer_stats_sorted_batched_pallas,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            impl = {
                "sorted_batched": zbuffer_stats_sorted_batched,
                "sorted_batched_gather": zbuffer_stats_sorted_batched_gather,
                "sorted_batched_dense": zbuffer_stats_sorted_batched_dense,
            }[merge_impl]
        stats = impl(lkeys, new_depth, src_int, valid, big * W + 1)
    else:
        view_idx = jnp.arange(B, dtype=jnp.int32).reshape(G, A, 1)
        keys = view_idx * (big * W) + row * W + col
        num_segments = B * big * W + 1  # +1 trash bin
        keys, new_depth, src_int, valid = jax.lax.optimization_barrier(
            (
                keys.reshape(-1),
                new_depth.reshape(-1).astype(jnp.float32),
                src_int.reshape(-1).astype(jnp.float32),
                valid.reshape(-1),
            )
        )
        stats = zbuffer_stats(keys, new_depth, src_int, valid, num_segments)

    def img(v):
        return v[: B * big * W].reshape(B, big, W)

    count = img(stats.count)
    # reference adds 1e-9 to the duplicate count before dividing (:445)
    avg_depth = img(stats.sum_value) / (count + 1e-9)
    avg_int = img(stats.sum_payload) / (count + 1e-9)

    if cfg.use_controlled_average:
        min_depth = img(stats.min_value)
        min_int = img(stats.min_payload)
        # compare in metres (models/__init__.py:458-481)
        avg_m = jnp.power(2.0, jnp.abs(avg_depth) * 6.0 / sigma_mod) - 1.0
        min_m = jnp.power(2.0, jnp.abs(min_depth) * 6.0 / sigma_mod) - 1.0
        allowance = cfg.effective_allowance
        over = avg_m > min_m + allowance
        avg_int = jnp.where(over, min_int, avg_int)
        avg_m = jnp.where(over, min_m + allowance / 5.0, avg_m)
        avg_depth = jnp.log2(avg_m + 1.0) / 6.0 * sigma_mod

    pix_mask = (count > 0).astype(x.dtype)

    # 6. crop extended grid to H rows, opposite-pixel fill for negatives
    out_depth = crop_big_with_negatives(avg_depth, is_neg, grid, negate_value=True)
    out_int = crop_big_with_negatives(avg_int, is_neg, grid, negate_value=False)
    out_mask = crop_big_with_negatives(pix_mask, is_neg, grid, negate_value=False)

    # dead sensor pixels never count; all views share view 0's mask (:498)
    out_mask = out_mask * (exist_mask[0][None] > 0)

    new_images = jnp.stack([out_depth, out_int], axis=1)
    mask_images = out_mask[:, None]
    return new_images, mask_images, too_high


def consistency_correction(
    x, new_images, mask_images, sky, known_mask, too_high
):
    """``-mask_shared * sky * ~known * (x - shared)``, zeroed when diverging
    (models/__init__.py:516-519, KITTISampling.py:427-430)."""
    gate = mask_images * sky.astype(x.dtype)
    corr = -gate * (1.0 - known_mask.astype(x.dtype)) * (x - new_images)
    return jnp.where(too_high, 0.0, corr)
