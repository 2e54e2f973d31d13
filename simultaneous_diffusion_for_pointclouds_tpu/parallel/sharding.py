"""Sharded entry points: jit the training step and the simultaneous sampler
over a (data, view) mesh.

Strategy (TPU-native, replaces the reference's ``nn.DataParallel``):

- **Training** (per-view independent losses): batch sharded over both mesh
  axes, params replicated; XLA inserts the gradient ``psum`` over ICI.
- **Simultaneous sampling**: batch sharded the same way.  Inside the
  consistency merge, the (G, A*N) shared cloud requires every view of a
  scene — with views sharded over ``view``, XLA turns the
  ``reshape(G, A*N)`` group-by-scene into an all-gather over the ``view``
  axis, and the per-target-view reprojection and segment reduction stay
  local.  Nothing is hand-communicated: shardings in, collectives out.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh

from .mesh import batch_sharding, replicate_sharding


def shard_train_step(train_step: Callable, mesh: Mesh):
    """Wrap a ``(state, rng, x, original_x, mask, timestep) -> (state, x,
    loss)`` step with mesh shardings: state replicated, image args batch-
    sharded."""
    repl = replicate_sharding(mesh)
    img = batch_sharding(mesh, 4)
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, img, img, img, repl),
        out_shardings=(repl, img, repl),
    )


def shard_simultaneous_sampler(sampler: Callable, mesh: Mesh, n_image_args: int):
    """Wrap a sampler ``(params, rng, x, *image_args, *aux) -> x``: the
    first ``n_image_args`` args after (params, rng) are (B, ...) arrays to
    batch-shard; everything else (origins, pose mats, scalars) replicates.
    """
    repl = replicate_sharding(mesh)
    cache = {}

    def jitted(params, rng, *rest):
        ndims = tuple(getattr(a, "ndim", 0) for a in rest)
        if ndims not in cache:
            shardings = [repl, repl]
            for i, nd in enumerate(ndims):
                shardings.append(batch_sharding(mesh, nd) if i < n_image_args else repl)
            cache[ndims] = jax.jit(sampler, in_shardings=tuple(shardings))
        return cache[ndims](params, rng, *rest)

    return jitted
