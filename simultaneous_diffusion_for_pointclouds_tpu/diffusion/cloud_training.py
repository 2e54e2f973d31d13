"""Shared-cloud ("3D-noise") training curriculum — debugged re-design of the
reference's experimental ``NCSNRunnerSimultaneous.train``
(runners/ncsn_runner_simultaneous.py:73-560).

The reference version is exported but never dispatched and carries latent
bugs (undefined ``batchSize`` :227, ``noiseX`` vs ``NoiseX`` case mismatch
:240, origin offsets added to the *noise* projection :236-238, unbounded
cloud growth).  This module implements the documented intent, jittable with
static shapes:

Per scene batch (all ``B`` views of one scene), per curriculum timestep:

1. the ground-truth views are unprojected once into a shared world cloud
   (one point per known pixel; point id = flat pixel index),
2. *forward diffusion*: fresh 3D Gaussian noise at ``sigma[t]`` is added to
   the clean cloud (XYZ + intensity), and the noised cloud is re-projected
   into every view with a min-depth z-buffer -> training images,
3. pixels not covered by the forward cloud fall back to the *prior* cloud
   (the reverse-diffusion state carried across timesteps), then to the
   previous timestep's images — so the network always sees hole-free inputs
   while the DSM loss only reads forward-covered pixels,
4. the per-pixel DSM target is the actual 3D displacement each winning
   point received, expressed in image space (new depth/intensity minus the
   winning point's ORIGINAL depth/intensity),
5. the returned scores are decoded to 3D and scatter-summed per point id to
   advance the prior cloud (reverse diffusion); hole pixels mint fresh
   points from the current images into a fixed-capacity fresh-slot table
   (slot = BN + pixel, overwriting older fresh points — the static-shape
   replacement for the reference's unbounded ``torch.unique`` reindexing).

Projection conventions follow the trainer, NOT the samplers: vertical scope
+15..-45 deg with UNflipped azimuth/elevation grids and strict ``> 0`` bin
checks (ncsn_runner_simultaneous.py:171-179,330-351).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.scatter import zbuffer_min2

# the trainer's hardcoded 8-view origin table, "/2000 so in same space as my
# distances" (ncsn_runner_simultaneous.py:184-193)
TRAINER_MODIFICATIONS = np.array(
    [
        [0, 0, 0], [10, 0, 0], [0, 10, 0], [10, 10, 0],
        [0, 0, 10], [-10, 0, 0], [0, -10, 0], [-10, -10, 0],
    ],
    dtype=np.float32,
) / 2000.0


@dataclasses.dataclass(frozen=True)
class TrainerGrid:
    """Unflipped trainer projection grid (+15..-45 deg vertical)."""

    rows: int
    cols: int

    @property
    def h_res(self) -> float:
        return math.radians(360.0) / self.cols

    @property
    def v_res(self) -> float:
        return math.radians(60.0) / self.rows

    @property
    def h_min(self) -> float:
        return (self.cols // -2) * self.h_res + self.h_res / 2

    @property
    def v_min(self) -> float:
        # rowCount*3//(-4) * vRes + vRes/2  (:180)
        return (self.rows * 3 // -4) * self.v_res + self.v_res / 2

    def angles(self):
        az = np.arange(self.cols) * self.h_res + self.h_min  # (W,)
        el = np.arange(self.rows) * self.v_res + self.v_min  # (H,)
        return az, el


def unproject_trainer(depth, grid: TrainerGrid, origins=None):
    """(B, H, W) depths -> (B, H, W, 3) points, unflipped angles
    (:227-229); ``origins`` (B, 3) optional translation."""
    az, el = grid.angles()
    az = jnp.asarray(az, depth.dtype).reshape(1, 1, -1)
    el = jnp.asarray(el, depth.dtype).reshape(1, -1, 1)
    x = depth * jnp.cos(az) * jnp.cos(el)
    y = depth * jnp.sin(az) * jnp.cos(el)
    z = depth * jnp.sin(el)
    pts = jnp.stack([x, y, z], axis=-1)
    if origins is not None:
        pts = pts + origins[:, None, None, :]
    return pts


def project_trainer(points, grid: TrainerGrid):
    """(..., 3) -> (row, col, depth); strict >0 bin checks are the caller's
    job (:341-343 uses greater(col, 0) etc.)."""
    px, py, pz = points[..., 0], points[..., 1], points[..., 2]
    xy2 = jnp.square(px) + jnp.square(py)
    depth = jnp.sqrt(xy2 + jnp.square(pz))
    col = jnp.round((jnp.arctan2(py, px) - grid.h_min) / grid.h_res).astype(jnp.int32)
    row = jnp.round(
        (jnp.arctan2(pz, jnp.sqrt(xy2)) - grid.v_min) / grid.v_res
    ).astype(jnp.int32)
    return row, col, depth


def init_cloud_carry(rng, x, mask, grid: TrainerGrid, origins, sigma0):
    """Initial reverse-diffusion state for one scene batch (:224-259).

    cloud: (2*B*H*W, 4) XYZI; slots [0, BN) = ground-truth pixel points,
    [BN, 2BN) = fresh-point slots (empty initially).  The prior cloud is the
    clean cloud plus sigma[0]-scale noise unprojected WITHOUT origin
    translation (the reference adds origins to the noise — bug, :236-238).
    """
    b, _, h, w = x.shape
    bn = b * h * w
    pts = unproject_trainer(x[:, 0], grid, origins).reshape(bn, 3)
    intens = x[:, 1].reshape(bn)

    noise2d = jax.random.normal(rng, x.shape, x.dtype) * sigma0
    noise3d = unproject_trainer(noise2d[:, 0], grid).reshape(bn, 3)
    noise_i = noise2d[:, 1].reshape(bn)

    cloud = jnp.zeros((2 * bn, 4), x.dtype)
    cloud = cloud.at[:bn, :3].set(pts + noise3d)
    cloud = cloud.at[:bn, 3].set(intens + noise_i)
    valid = jnp.concatenate(
        [mask[:, 0].reshape(bn) > 0, jnp.zeros(bn, bool)]
    )
    return {"cloud": cloud, "valid": valid, "updated": x}


def _project_cloud_images(cloud, valid, origins, grid: TrainerGrid, b):
    """Project a (C, 4) cloud into ``b`` views; min-depth z-buffer.

    Returns (depth, intensity, slot) images, slot = -1 where empty."""
    h, w = grid.rows, grid.cols
    rel = cloud[None, :, :3] - origins[:, None, :]
    row, col, depth = project_trainer(rel, grid)
    in_grid = (col > 0) & (col < w) & (row > 0) & (row < h)
    ok = in_grid & valid[None]
    view = jnp.arange(b, dtype=jnp.int32)[:, None]
    keys = (view * h + row) * w + col
    segs = b * h * w + 1
    slot_ids = jnp.arange(cloud.shape[0], dtype=jnp.int32)
    stats = zbuffer_min2(
        keys.reshape(-1),
        depth.reshape(-1),
        jnp.broadcast_to(cloud[None, :, 3], (b, cloud.shape[0])).reshape(-1),
        jnp.broadcast_to(
            slot_ids[None].astype(jnp.float32) + 1.0, (b, cloud.shape[0])
        ).reshape(-1),
        ok.reshape(-1),
        segs,
    )

    def img(v):
        return v[: b * h * w].reshape(b, h, w)

    return img(stats.min_value), img(stats.min_payload1), img(stats.min_payload2).astype(jnp.int32) - 1


def three_d_training_images(
    rng, x, mask, carry: Dict, timestep, sigmas, grid: TrainerGrid, origins
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict]:
    """Steps 1-4: build (images, dsm_noise, loss_mask, slot_img, fwd) for one
    curriculum timestep (:300-470)."""
    b, _, h, w = x.shape
    bn = b * h * w
    sigma_t = sigmas[timestep]

    # forward diffusion: clean cloud + fresh 3D noise at sigma[t]  (:298-305)
    pts = unproject_trainer(x[:, 0], grid, origins).reshape(bn, 3)
    intens = x[:, 1].reshape(bn)
    noise = jax.random.normal(rng, (bn, 4), x.dtype) * sigma_t
    fwd_cloud = jnp.concatenate([pts + noise[:, :3], (intens + noise[:, 3])[:, None]], axis=1)
    fwd_valid = mask[:, 0].reshape(bn) > 0

    pad = jnp.zeros((bn, 4), x.dtype)
    fwd_full = jnp.concatenate([fwd_cloud, pad])
    fwd_valid_full = jnp.concatenate([fwd_valid, jnp.zeros(bn, bool)])

    fd, fi, fslot = _project_cloud_images(fwd_full, fwd_valid_full, origins, grid, b)
    pd, pi, pslot = _project_cloud_images(
        carry["cloud"], carry["valid"], origins, grid, b
    )

    fwd_present = fd != 0
    prior_present = pd != 0
    updated = carry["updated"]

    depth = jnp.where(fwd_present, fd, jnp.where(prior_present, pd, updated[:, 0]))
    inten = jnp.where(fwd_present, fi, jnp.where(prior_present, pi, updated[:, 1]))
    slot_img = jnp.where(fwd_present, fslot, jnp.where(prior_present, pslot, -1))

    # DSM target: actual displacement of the winning forward point in image
    # space (imageDepth - oldDepth, :413-415); slots < BN index clean pixels
    safe = jnp.clip(fslot, 0, bn - 1)
    old_d = x[:, 0].reshape(bn)[safe.reshape(-1)].reshape(b, h, w)
    old_i = x[:, 1].reshape(bn)[safe.reshape(-1)].reshape(b, h, w)
    mag_change = jnp.where(fwd_present, fd - old_d, 0.0)
    int_change = jnp.where(fwd_present, fi - old_i, 0.0)

    images = jnp.stack([depth, inten], axis=1)
    dsm_noise = jnp.stack([mag_change, int_change], axis=1)
    loss_mask = fwd_present[:, None].astype(x.dtype)
    fwd = {"cloud": fwd_full, "valid": fwd_valid_full}
    return images, dsm_noise, loss_mask, slot_img, fwd


def advance_prior_cloud(
    scores, images, loss_mask, slot_img, fwd, carry, grid: TrainerGrid, origins
) -> Dict:
    """Step 5: reverse diffusion of the shared cloud from the network scores
    (:495-560, debugged).  Forward-covered pixels advance the forward point;
    prior-covered pixels advance the prior point; hole pixels mint fresh
    points from the current images at slot BN + pixel."""
    b, _, h, w = images.shape
    bn = b * h * w
    c = 2 * bn

    az, el = grid.angles()
    az = jnp.asarray(az, scores.dtype).reshape(1, 1, -1)
    el = jnp.asarray(el, scores.dtype).reshape(1, -1, 1)
    g0, g1 = scores[:, 0], scores[:, 1]
    gx = (g0 * jnp.cos(az) * jnp.cos(el)).reshape(-1)
    gy = (g0 * jnp.sin(az) * jnp.cos(el)).reshape(-1)
    gz = (g0 * jnp.sin(el)).reshape(-1)
    gi = g1.reshape(-1)

    slots = slot_img.reshape(-1)
    covered = slots >= 0
    seg = jnp.where(covered, slots, c)  # drop holes
    grads = jnp.stack([gx, gy, gz, gi], axis=1)

    def acc(col):
        return jnp.zeros(c, scores.dtype).at[seg].add(col, mode="drop")

    gsum = jnp.stack([acc(grads[:, i]) for i in range(4)], axis=1)

    is_fwd = jnp.where(covered & (loss_mask[:, 0].reshape(-1) > 0), slots, c)
    fwd_hit = jnp.zeros(c, bool).at[is_fwd].set(True, mode="drop")
    any_hit = jnp.zeros(c, bool).at[seg].set(True, mode="drop")

    base = jnp.where(fwd_hit[:, None], fwd["cloud"], carry["cloud"])
    new_cloud = base + gsum
    new_valid = any_hit & (fwd_hit | carry["valid"] | fwd["valid"])

    # fresh points for hole pixels: slot BN + pixel, from the current images
    holes = slots < 0
    pix_pts = unproject_trainer(images[:, 0], grid, origins).reshape(bn, 3)
    pix_i = images[:, 1].reshape(bn)
    fresh = jnp.concatenate([pix_pts + grads[:, :3], (pix_i + grads[:, 3])[:, None]], axis=1)
    new_cloud = new_cloud.at[bn:].set(jnp.where(holes[:, None], fresh, new_cloud[bn:]))
    new_valid = new_valid.at[bn:].set(holes | new_valid[bn:])

    return {"cloud": new_cloud, "valid": new_valid, "updated": images}
