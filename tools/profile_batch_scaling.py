"""Batch scaling of the fused simultaneous sampler on the real TPU.

python tools/profile_batch_scaling.py [scenes views [levels]]  (default 6 7 4)
Runs the full fused sampler (score + merge each step) at the given batch
shape for a few levels and reports steps/s + images*steps/s.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(scenes=6, views=7, levels=4, n_steps=5, sequential=False):
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

    H, W = 64, 1024
    B = scenes * views
    ns = argparse.Namespace
    config = ns(
        data=ns(dataset="KITTI360_im_8batch", channels=2, image_size=H,
                image_width=W, logit_transform=False, rescaled=False),
        model=ns(sigma_begin=50.0, sigma_end=0.01, num_classes=232,
                 sigma_dist="geometric", normalization="InstanceNorm++",
                 nonlinearity="elu", ngf=128),
    )
    model = get_model(config)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (B, 2, H, W), jnp.float32)
    params = model.init(rng, x0[:1], jnp.zeros((1,), jnp.int32))["params"]

    full = np.asarray(get_sigmas(config))
    sigmas = jnp.asarray(full[:: len(full) // levels][:levels])
    grid = kitti_sampler_grid(H, W)
    mask = (jax.random.uniform(jax.random.PRNGKey(1), x0.shape) > 0.5).astype(jnp.float32)
    sky = jnp.ones((B, 1, H, W), jnp.float32)
    exist = jnp.ones((B, H, W), jnp.float32)
    eye = jnp.tile(jnp.eye(4)[None], (B, 1, 1)).astype(jnp.float32)

    def score_fn(inp, lbl):
        return model.apply({"params": params}, inp, lbl)

    ccfg = ConsistencyConfig(grid=grid, actual_batch_size=views, setting=5,
                             variant="poses", sequential_groups=sequential)
    lcfg = LangevinConfig(n_steps_each=n_steps, step_lr=6.2e-6, denoise=False)

    @jax.jit
    def fused(rng, x):
        return simultaneous_inpainting_sample(
            rng, x, score_fn, sigmas, lcfg, ccfg,
            refer_image=x0, refer_mask=mask, sky=sky, exist_mask=exist,
            min_step_to_share=0, grad_ref=1.0, correlation_coefficient=0.01,
            to_world=eye, from_world=eye,
        )

    print(f"shape: {scenes}x{views} = {B} images, {levels} levels x {n_steps} steps"
          f" sequential_groups={sequential}", flush=True)
    t0 = time.time()
    jax.block_until_ready(fused(rng, x0))
    print(f"compile+first run: {time.time()-t0:.1f}s", flush=True)
    times = []
    for i in range(3):
        t = time.perf_counter()
        jax.block_until_ready(fused(jax.random.PRNGKey(i), x0))
        times.append(time.perf_counter() - t)
    steps = levels * n_steps
    sps = steps / min(times)
    print(f"steps/s: {sps:.3f}  image-steps/s: {sps*B:.1f}", flush=True)


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:4]]
    seq = "--seq" in sys.argv
    main(*(a + [6, 7, 4][len(a):][:3-len(a)] if a else [6, 7, 4]), sequential=seq)
