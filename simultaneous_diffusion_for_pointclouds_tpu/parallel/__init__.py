from .mesh import (
    batch_sharding,
    batch_sharding_for,
    best_batch_axes,
    make_mesh,
    maybe_mesh,
    replicate_sharding,
)
from .sharding import (
    shard_base_step,
    shard_simultaneous_sampler,
    shard_train3d_step,
    shard_train_step,
)

__all__ = [
    "make_mesh",
    "maybe_mesh",
    "batch_sharding",
    "batch_sharding_for",
    "best_batch_axes",
    "replicate_sharding",
    "shard_train_step",
    "shard_base_step",
    "shard_train3d_step",
    "shard_simultaneous_sampler",
]
