from .mesh import make_mesh, batch_sharding, replicate_sharding
from .sharding import shard_train_step, shard_simultaneous_sampler

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_train_step",
    "shard_simultaneous_sampler",
]
