from .mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
    shard_pytree)
