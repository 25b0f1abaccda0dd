from .mesh import (
    batch_sharding,
    create_mesh,
    replicate_batch,
    replicated_sharding,
    shard_batch,
    shard_pytree)
