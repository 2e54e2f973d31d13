#!/usr/bin/env python
"""MFU measurement for the flagship sampling step.

Computes the model-FLOP utilisation of (a) a score-net forward and (b) one
fused Langevin step (score + cross-view merge) at the 8-view flagship shape,
using XLA's own cost analysis for the FLOP count and marginal-cost timing
(PERF_NOTES.md protocol) for wall-clock.  Peak is the chip's bf16 MXU rate
(XLA runs f32 convs as bf16 MXU passes by default).

Usage: python tools/mfu.py [--views 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

PEAKS_TFLOPS = {  # bf16 dense, per chip
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--levels", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _config
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

    dev = jax.devices()[0]
    kind = dev.device_kind
    peak = PEAKS_TFLOPS.get(kind)
    if peak is None:
        print(f"warning: unknown device kind {kind!r}; assuming v5e peak", file=sys.stderr)
        peak = 197.0

    V, H, W = args.views, 64, 1024
    config = _config()
    model = get_model(config)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (V, 2, H, W), jnp.float32)
    labels0 = jnp.zeros((V,), jnp.int32)
    params = model.init(rng, x0, labels0)["params"]

    # ---- score forward -------------------------------------------------
    def fwd(x):
        return model.apply({"params": params}, x, labels0)

    lowered = jax.jit(fwd).lower(x0)
    fwd_flops = lowered.compile().cost_analysis()["flops"]

    def chain(n):
        def f(x):
            for _ in range(n):
                x = fwd(x) + x * 1e-6  # data dependency, negligible extra
            return x
        return f

    from simultaneous_diffusion_for_pointclouds_tpu.utils.profiling import marginal_cost

    fwd_t = marginal_cost(chain, x0, n1=1, n2=5, reps=3)

    # ---- full fused sampler step --------------------------------------
    sigmas_full = get_sigmas(config)
    grid = kitti_sampler_grid(H, W)
    mask = (jax.random.uniform(jax.random.PRNGKey(1), x0.shape) > 0.5).astype(jnp.float32)
    sky = jnp.ones((V, 1, H, W), jnp.float32)
    exist = jnp.ones((V, H, W), jnp.float32)
    eye = jnp.tile(jnp.eye(4)[None], (V, 1, 1)).astype(jnp.float32)
    ccfg = ConsistencyConfig(grid=grid, actual_batch_size=V, setting=5, variant="poses")
    lcfg = LangevinConfig(n_steps_each=5, step_lr=6.2e-6, denoise=False)

    def score2(x, labels):
        return model.apply({"params": params}, x, labels)

    def sampler_n(levels):
        sig = jnp.asarray(sigmas_full[:levels])

        def f(x):
            return simultaneous_inpainting_sample(
                jax.random.PRNGKey(0), x, score2, sig, lcfg, ccfg,
                refer_image=x0, refer_mask=mask, sky=sky, exist_mask=exist,
                min_step_to_share=0, grad_ref=1.0, correlation_coefficient=0.01,
                to_world=eye, from_world=eye,
            )
        return f

    n1, n2 = 1, 1 + args.levels
    f1, f2 = jax.jit(sampler_n(n1)), jax.jit(sampler_n(n2))
    # XLA cost analysis counts a lax.scan body ONCE regardless of trip count,
    # so a level-count diff is useless.  Use the score forward's FLOPs as the
    # per-step useful work (one forward per Langevin step; the merge is
    # sort/scan data movement, not FLOPs).
    step_flops = fwd_flops

    def run(f):
        float(jnp.sum(f(x0)))
        t = time.perf_counter()
        for _ in range(3):
            float(jnp.sum(f(x0)))
        return (time.perf_counter() - t) / 3

    step_t = (run(f2) - run(f1)) / ((n2 - n1) * lcfg.n_steps_each)

    out = {
        "device": kind,
        "peak_bf16_tflops": peak,
        "score_fwd": {
            "flops": fwd_flops,
            "ms": round(fwd_t * 1e3, 2),
            "tflops_per_s": round(fwd_flops / fwd_t / 1e12, 1),
            "mfu": round(fwd_flops / fwd_t / (peak * 1e12), 4),
        },
        "langevin_step": {
            "flops_note": "score-forward FLOPs only; merge is sort/scan-bound",
            "flops": step_flops,
            "ms": round(step_t * 1e3, 2),
            "tflops_per_s": round(step_flops / step_t / 1e12, 1),
            "mfu": round(step_flops / step_t / (peak * 1e12), 4),
        },
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    sys.exit(main())
