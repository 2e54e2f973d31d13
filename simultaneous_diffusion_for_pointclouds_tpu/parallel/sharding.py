"""Sharded entry points: jit the training steps and the samplers over a
(data, view) mesh.

Strategy (TPU-native, replaces the reference's ``nn.DataParallel``,
ncsn_runner.py:55 — which wraps the model on EVERY production path):

- **Training** (per-view independent losses): batch sharded over both mesh
  axes, params replicated; XLA inserts the gradient ``psum`` over ICI.
- **Simultaneous sampling**: batch sharded the same way.  Inside the
  consistency merge, the (G, A*N) shared cloud requires every view of a
  scene — with views sharded over ``view``, XLA turns the
  ``reshape(G, A*N)`` group-by-scene into an all-gather over the ``view``
  axis, and the per-target-view reprojection and segment reduction stay
  local.  Nothing is hand-communicated: shardings in, collectives out.

All wrappers recover gracefully when a batch dim does not divide the mesh
(the ablation plan varies the view count per variant): they shard over the
largest dividing axis subset, or replicate (see ``mesh.best_batch_axes``).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh

from .mesh import batch_sharding_for, replicate_sharding


def shard_train_step(train_step: Callable, mesh: Mesh):
    """Wrap a ``(state, rng, x, original_x, mask, timestep) -> (state, x,
    loss)`` step with mesh shardings: state replicated, image args batch-
    sharded (per-batch-size cache so odd remainders degrade, not fail)."""
    repl = replicate_sharding(mesh)
    cache = {}

    def jitted(state, rng, x, *rest):
        b = x.shape[0]
        if b not in cache:
            img = batch_sharding_for(mesh, b, 4)
            cache[b] = jax.jit(
                train_step,
                in_shardings=(repl, repl, img, img, img, repl),
                out_shardings=(repl, img, repl),
            )
        return cache[b](state, rng, x, *rest)

    return jitted


def shard_base_step(base_step: Callable, mesh: Mesh):
    """Wrap the plain-DSM ``(state, rng, x) -> (state, loss)`` step
    (BaseTrainer): x batch-sharded, state replicated."""
    repl = replicate_sharding(mesh)
    cache = {}

    def jitted(state, rng, x):
        b = x.shape[0]
        if b not in cache:
            img = batch_sharding_for(mesh, b, x.ndim)
            cache[b] = jax.jit(
                base_step,
                in_shardings=(repl, repl, img),
                out_shardings=(repl, repl),
            )
        return cache[b](state, rng, x)

    return jitted


def shard_train3d_step(step: Callable, mesh: Mesh):
    """Wrap the shared-cloud 3D-noise ``(state, rng, x, mask, carry,
    timestep) -> (state, carry, loss)`` step: x/mask batch-sharded, the
    per-scene shared-cloud carry replicated (every view of the scene
    contributes to it each step — the per-point scatter averages become
    XLA collectives over the sharded view contributions)."""
    repl = replicate_sharding(mesh)
    cache = {}

    def jitted(state, rng, x, mask, carry, timestep):
        b = x.shape[0]
        if b not in cache:
            img = batch_sharding_for(mesh, b, x.ndim)
            cache[b] = jax.jit(
                step,
                in_shardings=(repl, repl, img, img, repl, repl),
                out_shardings=(repl, repl, repl),
            )
        return cache[b](state, rng, x, mask, carry, timestep)

    return jitted


def shard_simultaneous_sampler(sampler: Callable, mesh: Mesh, n_image_args: int):
    """Wrap a sampler ``(params, rng, x, *image_args, *aux) -> x``: the
    first ``n_image_args`` args after (params, rng) are (B, ...) arrays to
    batch-shard; everything else (origins, pose mats, scalars) replicates.
    """
    repl = replicate_sharding(mesh)
    cache = {}

    def jitted(params, rng, *rest):
        ndims = tuple(getattr(a, "ndim", 0) for a in rest)
        batch = rest[0].shape[0]
        key = (batch, ndims)
        if key not in cache:
            shardings = [repl, repl]
            for i, nd in enumerate(ndims):
                shardings.append(
                    batch_sharding_for(mesh, batch, nd) if i < n_image_args else repl
                )
            cache[key] = jax.jit(sampler, in_shardings=tuple(shardings))
        return cache[key](params, rng, *rest)

    return jitted
