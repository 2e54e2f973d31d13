"""Second-method simultaneous sampler: 3D-noise with persistent point ids.

Re-design of ``models/__init__.py:604-1382``
(``anneal_Langevin_dynamics_inpainting_simultaneous_second_method``): instead
of correcting 2D images toward a shared cloud, the *state itself* lives as a
point cloud.  Every step:

1. per-pixel Langevin update is decoded to a 3D displacement,
2. pixels carrying the same persistent point id (tracked in ``x_indices``;
   fresh ids are minted for id==-1 pixels) have their positions and
   displacements scatter-averaged per id,
3. the averaged cloud (optionally pulled 10% toward the ground-truth median
   for setting 7, first 200 levels) is re-projected into every view with a
   min-depth z-buffer, regenerating both ``x_mod`` and ``x_indices``;
   empty pixels keep their previous image values,
4. setting>=4 hard-resets known pixels to GT+noise and their ids to the
   reference indices each step.

Static-shape notes (vs the reference's dynamic ``torch.unique`` tables):
ids live in a fixed-capacity table (``id_capacity``); renumbering-compaction
uses a dense cumsum over the table; fresh-id minting reproduces the
reference's ``arange + max`` (including its first-new-id == max collision).
The vertical scope here is the mining grid (+15..-45 deg, reference :644-646),
not KITTI's.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import (
    RangeGrid,
    crop_big_with_negatives,
    pose_transform,
    unproject,
)
from ..ops.scatter import _segmented_scan_2d_multi, zbuffer_min2
from .langevin import LangevinConfig, _level_noise


def mine_sampler_grid(rows: int, cols: int) -> RangeGrid:
    """Sampler grid with the mining vertical scope +15..-45 deg
    (models/__init__.py:644-675)."""
    h_scope, v_min_deg, v_max_deg = 360.0, -45.0, 15.0
    v_scope = v_max_deg - v_min_deg
    h_res = math.radians(h_scope) / cols
    v_res = math.radians(v_scope) / rows
    h_min = ((cols * -180.0) // h_scope) * h_res + h_res / 2
    v_min = ((rows * v_min_deg) // v_scope) * v_res + v_res / 2
    big_rows = int(max(abs(v_min_deg), abs(v_max_deg)) * 2 * rows // v_scope)
    big_v_min = (big_rows // -2) * v_res + v_res / 2
    return RangeGrid(rows, cols, h_res, v_res, h_min, v_min, big_rows, big_v_min)


@dataclasses.dataclass(frozen=True)
class SecondMethodConfig:
    grid: RangeGrid
    setting: int = 4
    id_capacity: int = 0  # 0 -> auto: 3 * B*H*W
    median_pull_levels: int = 200
    # "offsets": per-view origin translations (models/__init__.py:604-1382).
    # Renumber-sort payload routing: "carry" threads the four pre-added
    # value channels through the bitonic network (5 operands); "iota" sorts
    # (ids, iota) and gathers them afterwards (2 operands + 4 gathers).
    # Identical results (stable sort); pick by TPU measurement.
    sort_payload_mode: str = "carry"
    # "poses": the DEBUGGED redesign of the reference's pose twin
    # (KITTISampling.py:515-1299) — that body takes fromWorld/toWorld but
    # never uses them (it is a byte-identical copy of the offsets method
    # with denoise=False that would NameError on its undefined
    # ``modificationList``, :608); here the signature's intent is realised:
    # views unproject into WORLD coordinates via to_world, the per-id
    # averaging runs in the world frame, and the shared cloud reprojects
    # into each view via from_world.
    variant: str = "offsets"
    # "auto": the Pallas row-batched min z-buffer on TPU (the flat sort
    # pipeline costs ~117 ms/step at the 8-view HDVMine shape), the flat
    # zbuffer_min2 elsewhere; explicit "pallas"/"flat" override.
    merge_impl: str = "auto"
    # Order-preserving dense renumbering of the point ids at the start of
    # every step: shrinks the per-step tables (averaging, reprojection,
    # z-buffer) from the 3x id capacity to B*H*W+1 slots.  EXACT for the
    # sampled images — ids only group pixels, and an order-preserving
    # renumber leaves both the grouping and the visible-cumsum id images
    # unchanged (the reference's raw id values are internal bookkeeping).
    dense_renumber: bool = True

    @property
    def resolved_merge_impl(self) -> str:
        if self.merge_impl not in ("auto", "pallas", "flat"):
            raise NotImplementedError(
                f"merge_impl {self.merge_impl!r} not in ('auto', 'pallas', 'flat')"
            )
        if self.merge_impl != "auto":
            return self.merge_impl
        return "pallas" if jax.default_backend() == "tpu" else "flat"


def _signed_decode(x, sigma_mod):
    is_neg = (x < 0).astype(x.dtype)
    sign = 1.0 - 2.0 * is_neg
    return (jnp.power(2.0, jnp.abs(x) * 6.0 / sigma_mod) - 1.0) * sign, is_neg


def simultaneous_second_method_sample(
    rng,
    x_mod,
    score_fn,
    sigmas,
    cfg: LangevinConfig,
    scfg: SecondMethodConfig,
    *,
    refer_image,
    refer_mask,
    refer_indices,
    origins,
    raw_origins=None,
    to_world=None,
    from_world=None,
    grad_ref: float = 0.1,
    start_level=0,
    total_levels=None,
    sigma_last=None,
    carry_in=None,
    finalize: bool = True,
):
    """Returns the final (B, 2, H, W) images.

    Segmented execution (see langevin._guided_sample): ``sigmas`` may be a
    ladder segment at absolute offset ``start_level`` with
    ``total_levels``/``sigma_last`` describing the full ladder;
    ``carry_in=(x_indices, gl, gt_med)`` resumes a previous segment and
    ``finalize=False`` returns ``(x, ids, gl, gt_med)`` without the final
    denoise/clamp (the initial data-consistency nudge and the setting-7
    median only happen in segment 0; the median rides the carry).  Chunked
    == unchunked bitwise — noise keys and the median-pull level test use
    absolute indices.

    ``refer_indices``: (B, 1, H, W) or (B, H, W) float/int per-pixel point
    ids from the dataset projection (-1 where empty).
    ``origins``: (B, 3) effective per-view origins (already through
    :func:`consistency.effective_origins`) — used for un/reprojection
    inside the level loop (reference models/__init__.py:636-639,734).
    ``raw_origins``: (B, 3) UNrescaled origins — the setting-7
    ground-truth median is computed with these (``originListOG``,
    models/__init__.py:713-715); defaults to ``origins``.
    """
    grid = scfg.grid
    B, _, H, W = x_mod.shape
    N = H * W
    BN = B * N
    C = scfg.id_capacity or 3 * BN
    big = grid.big_rows
    L = int(sigmas.shape[0])
    Ltot = L if total_levels is None else total_levels
    sigma_last = sigmas[-1] if sigma_last is None else sigma_last
    mask = refer_mask.astype(x_mod.dtype)
    refer_idx = refer_indices.reshape(B, H, W).astype(jnp.int32)
    origins = jnp.asarray(origins, x_mod.dtype)

    if carry_in is not None:
        # resumed segment: the initial nudge already happened in segment 0
        # and the setting-7 median was computed there from the INITIAL x
        x_indices, gl_in, gt_med = carry_in
        x_indices = x_indices.astype(jnp.int32)
        return _second_method_levels(
            rng, x_mod, x_indices, gl_in, gt_med, score_fn, sigmas, cfg,
            scfg, refer_image=refer_image, mask=mask, refer_idx=refer_idx,
            origins=origins, to_world=to_world, from_world=from_world,
            grad_ref=grad_ref, start_level=start_level,
            total_levels=Ltot, sigma_last=sigma_last, finalize=finalize,
        )

    x_mod, (x_indices, gl0, gt_med) = second_method_prelude(
        x_mod, refer_image=refer_image, refer_mask=refer_mask,
        refer_indices=refer_indices, origins=origins,
        raw_origins=raw_origins, to_world=to_world, scfg=scfg,
        grad_ref=grad_ref,
    )
    return _second_method_levels(
        rng, x_mod, x_indices, gl0, gt_med, score_fn,
        sigmas, cfg, scfg, refer_image=refer_image, mask=mask,
        refer_idx=refer_idx, origins=origins, to_world=to_world,
        from_world=from_world, grad_ref=grad_ref,
        start_level=start_level, total_levels=Ltot, sigma_last=sigma_last,
        finalize=finalize,
    )


def second_method_prelude(
    x_mod, *, refer_image, refer_mask, refer_indices, origins,
    raw_origins=None, to_world=None, scfg: SecondMethodConfig, grad_ref,
):
    """Segment-0 initialisation, exposed for the runner's chunked-ladder
    driver: the data-consistency nudge, the initial id image, and the
    setting-7 GT median.  Returns ``(x, (ids, gl0, gt_med))`` — the second
    element is exactly the ``carry_in`` a resumed segment expects."""
    grid = scfg.grid
    B, _, H, W = x_mod.shape
    mask = refer_mask.astype(x_mod.dtype)
    refer_idx = refer_indices.reshape(B, H, W).astype(jnp.int32)
    origins = jnp.asarray(origins, x_mod.dtype)

    # initial data-consistency nudge (:630-631)
    x_mod = x_mod + grad_ref * (-mask * (x_mod - refer_image))
    x_indices = refer_idx

    # setting 7: ground-truth median in world coordinates, translated by the
    # RAW origins, not the rescaled ones (:710-716 uses originListOG)
    if scfg.setting == 7:
        dist0 = jnp.power(2.0, jnp.abs(x_mod[:, 0]) * 6.0) - 1.0
        if scfg.variant == "poses":
            # world-frame median: to_world IS the raw (untampered) frame
            pts0 = pose_transform(
                unproject(dist0, grid).reshape(x_mod.shape[0], -1, 3),
                jnp.asarray(to_world, x_mod.dtype),
            )
        else:
            med_origins = origins if raw_origins is None else jnp.asarray(raw_origins, x_mod.dtype)
            pts0 = unproject(dist0, grid, med_origins)
        known = (mask[:, 0] != 0).reshape(-1)

        def torch_median(vals):
            # torch.median returns the LOWER of the two middle elements for
            # even counts (unlike numpy's average); NaNs sort last.
            v = jnp.sort(jnp.where(known, vals, jnp.nan))
            k = jnp.sum(known)
            return v[jnp.maximum((k - 1) // 2, 0)]

        flat = pts0.reshape(-1, 3)
        gt_med = jnp.stack([
            torch_median(flat[:, 0]), torch_median(flat[:, 1]),
            torch_median(flat[:, 2]),
        ])
    else:
        gt_med = jnp.zeros(3, x_mod.dtype)

    return x_mod, (x_indices, jnp.zeros_like(x_mod), gt_med)


def _second_method_levels(
    rng, x_mod, x_indices, gl_in, gt_med, score_fn, sigmas, cfg,
    scfg: SecondMethodConfig, *, refer_image, mask, refer_idx, origins,
    to_world=None, from_world=None,
    grad_ref, start_level, total_levels, sigma_last, finalize,
):
    """The per-level scan + tail shared by fresh and resumed segments
    (see :func:`simultaneous_second_method_sample`)."""
    grid = scfg.grid
    B, _, H, W = x_mod.shape
    N = H * W
    BN = B * N
    C = scfg.id_capacity or 3 * BN
    big = grid.big_rows
    L = int(sigmas.shape[0])
    view_idx = jnp.arange(B, dtype=jnp.int32).reshape(B, 1)

    def level(carry, cs):
        x, ids, _ = carry
        c, sigma = cs
        labels = jnp.full((B,), c, jnp.int32)
        step_size = cfg.step_lr * (sigma / sigma_last) ** 2
        sigma_mod = jnp.maximum(sigma, 1.0)

        def step(s, inner):
            x, ids, _ = inner
            grad = jnp.nan_to_num(score_fn(x, labels))
            gl = -mask * (x - refer_image)
            noise = _level_noise(rng, c, s, x.shape, x.dtype, cfg.noise_scale)
            if scfg.setting < 4:
                total_grad = step_size * grad + grad_ref * gl + noise * jnp.sqrt(step_size * 2.0)
            else:
                total_grad = step_size * grad + noise * jnp.sqrt(step_size * 2.0)

            dist, is_neg = _signed_decode(x[:, 0], sigma_mod)
            # noise decoded with the IMAGE's sign and no sigmaMod (:783)
            sign = 1.0 - 2.0 * is_neg
            real_noise = (jnp.power(2.0, jnp.abs(total_grad[:, 0]) * 6.0) - 1.0) * sign

            if scfg.variant == "poses":
                # view frame -> world via to_world (positions: full pose;
                # displacement vectors: rotation only)
                tw = jnp.asarray(to_world, x.dtype)
                pts = pose_transform(
                    unproject(dist, grid).reshape(B, N, 3), tw
                ).reshape(BN, 3)
                nois = jnp.einsum(
                    "bij,bnj->bni", tw[:, :3, :3],
                    unproject(real_noise, grid).reshape(B, N, 3),
                ).reshape(BN, 3)
            else:
                pts = unproject(dist, grid, origins).reshape(BN, 3)
                nois = unproject(real_noise, grid).reshape(BN, 3)
            intens = x[:, 1].reshape(BN)
            noise_i = total_grad[:, 1].reshape(BN)

            # 2D fallback update for holes (:829)
            x2d = x + step_size * grad + grad_ref * gl + noise * jnp.sqrt(step_size * 2.0)

            # mint fresh ids for -1 pixels: arange + max (collision kept, :832)
            flat_ids = ids.reshape(BN)
            is_new = flat_ids == -1
            max_id = jnp.max(flat_ids)
            fresh = max_id + jnp.cumsum(is_new.astype(jnp.int32)) - 1
            flat_ids = jnp.where(is_new, fresh, flat_ids)
            flat_ids = jnp.clip(flat_ids, 0, C - 2)  # capacity guard

            if scfg.dense_renumber:
                # Sorted-stream averaging (round 3): the order-preserving
                # dense renumber already sorts by id, so carry the four
                # PRE-ADDED value channels (avg(a)+avg(b) == avg(a+b) over
                # identical segments) through that sort, compute per-id sums
                # with a segmented Hillis-Steele scan on the sorted stream
                # (segment-local magnitudes — no f32 cancellation, unlike a
                # global cumsum), scatter only the int32 segment-END
                # positions once, and gather the dense table.  Replaces the
                # id write-back scatter + 9 ``segment_sum`` scatters of the
                # round-2 pipeline; per-pixel ids never materialise at all.
                # T = BN + 1 slots: at most BN distinct ids + 1 OOB drop.
                T = BN + 1
                if scfg.sort_payload_mode == "iota":
                    sid, perm = jax.lax.sort(
                        (flat_ids, jnp.arange(BN, dtype=jnp.int32)), num_keys=1
                    )
                    s0 = (pts[:, 0] + nois[:, 0])[perm]
                    s1 = (pts[:, 1] + nois[:, 1])[perm]
                    s2 = (pts[:, 2] + nois[:, 2])[perm]
                    s3 = (intens + noise_i)[perm]
                else:
                    sid, s0, s1, s2, s3 = jax.lax.sort(
                        (
                            flat_ids,
                            pts[:, 0] + nois[:, 0],
                            pts[:, 1] + nois[:, 1],
                            pts[:, 2] + nois[:, 2],
                            intens + noise_i,
                        ),
                        num_keys=1,
                    )
                change = sid[1:] != sid[:-1]
                first = jnp.concatenate([jnp.ones(1, bool), change])
                dense_sorted = jnp.cumsum(first.astype(jnp.int32)) - 1
                if scfg.resolved_merge_impl == "pallas":
                    # Round 3: per-id sums through the one-hot MXU kernel —
                    # the dense-renumbered stream is sorted AND dense, so
                    # chunk output windows are bounded and group partials
                    # recombine with ~64 slice-adds (no 524k scatter, no
                    # 20-pass segmented scan, no end-position gathers).
                    from ..ops.zbuffer_pallas import segment_sums_sorted_pallas

                    sums4, raw_count = segment_sums_sorted_pallas(
                        dense_sorted, (s0, s1, s2, s3), T,
                        interpret=jax.default_backend() != "tpu",
                    )
                    used = raw_count > 0
                    count = raw_count + 1e-12
                    cx = sums4[0] / count
                    cy = sums4[1] / count
                    cz = sums4[2] / count
                    ci = sums4[3] / count
                else:
                    end = jnp.concatenate([change, jnp.ones(1, bool)])
                    sums, _ = _segmented_scan_2d_multi(
                        [s[None] for s in (s0, s1, s2, s3)], [s0[None]], first[None]
                    )
                    # one unique int32 scatter: each segment's end position
                    # lands at its dense id; non-end entries go out of
                    # bounds (dropped)
                    ends_pos = (
                        jnp.full(T, -1, jnp.int32)
                        .at[jnp.where(end, dense_sorted, T)]
                        .set(
                            jnp.arange(BN, dtype=jnp.int32),
                            mode="drop", unique_indices=True,
                        )
                    )
                    used = ends_pos >= 0
                    prev = jnp.concatenate(
                        [jnp.full(1, -1, jnp.int32), ends_pos[:-1]]
                    )
                    raw_count = jnp.where(
                        used, (ends_pos - prev).astype(jnp.float32), 0.0
                    )
                    count = raw_count + 1e-12
                    gpos = jnp.maximum(ends_pos, 0)
                    cx = jnp.where(used, sums[0][0][gpos], 0.0) / count
                    cy = jnp.where(used, sums[1][0][gpos], 0.0) / count
                    cz = jnp.where(used, sums[2][0][gpos], 0.0) / count
                    ci = jnp.where(used, sums[3][0][gpos], 0.0) / count
            else:
                T = C

                # scatter-average positions, intensity, displacement per id
                ones = jnp.ones(BN, jnp.float32)
                raw_count = jax.ops.segment_sum(ones, flat_ids, T)
                count = raw_count + 1e-12

                def avg(v):
                    return jax.ops.segment_sum(v, flat_ids, T) / count

                cx = avg(pts[:, 0]) + avg(nois[:, 0])
                cy = avg(pts[:, 1]) + avg(nois[:, 1])
                cz = avg(pts[:, 2]) + avg(nois[:, 2])
                ci = avg(intens) + avg(noise_i)
                used = raw_count > 0

            if scfg.setting == 7:
                pull = (c < scfg.median_pull_levels).astype(x.dtype)
                cx = jnp.where(pull > 0, 0.9 * cx + 0.1 * gt_med[0], cx)
                cy = jnp.where(pull > 0, 0.9 * cy + 0.1 * gt_med[1], cy)
                cz = jnp.where(pull > 0, 0.9 * cz + 0.1 * gt_med[2], cz)

            cloud = jnp.stack([cx, cy, cz], axis=-1)  # (T, 3)

            # re-project all ids into every view (B, T)
            if scfg.variant == "poses":
                fw = jnp.asarray(from_world, x.dtype)
                rel = (
                    jnp.einsum("bij,tj->bti", fw[:, :3, :3], cloud)
                    + fw[:, None, :3, 3]
                )
            else:
                rel = cloud[None] - origins[:, None, :]
            px, py, pz = rel[..., 0], rel[..., 1], rel[..., 2]
            xy2 = px**2 + py**2
            depth_m = jnp.sqrt(xy2 + pz**2)
            col = jnp.round((jnp.arctan2(py, px) - grid.h_min) / grid.h_res).astype(jnp.int32)
            row = jnp.round(
                (jnp.arctan2(pz, jnp.sqrt(xy2)) - grid.big_v_min) / grid.v_res
            ).astype(jnp.int32)
            col = -col + W - 1
            row = -row + big - 1
            new_depth = jnp.log2(depth_m + 1.0) / 6.0 * sigma_mod

            in_grid = (col > -1) & (col < W) & (row > -1) & (row < big)
            valid = in_grid & used[None]

            # compact renumbering of surviving ids (:936-943): ids visible in
            # ANY view keep a slot; renumber 1..n (0 = the discarded bucket),
            # images later subtract 1 so empty -> -1.
            visible = jnp.any(valid, axis=0)
            new_num = jnp.cumsum(visible.astype(jnp.int32))  # 1-indexed
            point_new_id = jnp.where(visible, new_num, 0)

            # ONE widened min pass carrying both payloads (intensity + id)
            # instead of round 1's two zbuffer_stats calls
            if scfg.resolved_merge_impl == "pallas":
                from ..ops.zbuffer_pallas import zbuffer_min2_batched_pallas

                stats = zbuffer_min2_batched_pallas(
                    row * W + col, new_depth,
                    jnp.broadcast_to(ci[None], (B, T)),
                    jnp.broadcast_to(point_new_id[None].astype(jnp.float32), (B, T)),
                    valid, big * W + 1,
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                keys = view_idx * (big * W) + row * W + col
                segs = B * big * W + 1
                stats = zbuffer_min2(
                    keys.reshape(-1), new_depth.reshape(-1),
                    jnp.broadcast_to(ci[None], (B, T)).reshape(-1),
                    jnp.broadcast_to(point_new_id[None].astype(jnp.float32), (B, T)).reshape(-1),
                    valid.reshape(-1), segs,
                )

            def img(v):
                return v[: B * big * W].reshape(B, big, W)

            depth_img = img(stats.min_value)
            int_img = img(stats.min_payload1)
            id_img = img(stats.min_payload2)

            # crop + opposite-pixel fill; depth NOT negated here (:1045)
            d = crop_big_with_negatives(depth_img, is_neg, grid, negate_value=False)
            i = crop_big_with_negatives(int_img, is_neg, grid, negate_value=False)
            pid = crop_big_with_negatives(id_img, is_neg, grid, negate_value=False)
            pid = pid.astype(jnp.int32) - 1

            # empty pixels keep updated 2D values (:1061-1062)
            empty = d == 0
            new_x = jnp.stack(
                [jnp.where(empty, x2d[:, 0], d), jnp.where(empty, x2d[:, 1], i)], axis=1
            )
            new_ids = jnp.where(empty, -1, pid)

            if scfg.setting >= 4:
                gt_noise = refer_image + noise * jnp.sqrt(step_size * 2.0)
                new_x = jnp.where(mask != 0, gt_noise, new_x)
                new_ids = new_ids + jnp.max(refer_idx)
                new_ids = jnp.where(mask[:, 0] != 0, refer_idx, new_ids)

            return (new_x, new_ids, gl)

        x, ids, gl = jax.lax.fori_loop(
            0, cfg.n_steps_each, step, (x, ids, jnp.zeros_like(x))
        )
        return (x, ids, gl), None

    init = (x_mod, x_indices, gl_in)
    (x_mod, ids, gl), _ = jax.lax.scan(
        level, init, (jnp.arange(L) + start_level, sigmas)
    )

    if not finalize:
        return x_mod, ids, gl, gt_med

    if cfg.denoise:
        labels = jnp.full((B,), total_levels - 1, jnp.int32)
        x_mod = x_mod + sigma_last**2 * score_fn(x_mod, labels) + grad_ref * gl
    x_mod = x_mod + grad_ref * (-mask * (x_mod - refer_image))
    return x_mod
