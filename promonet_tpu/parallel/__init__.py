from .mesh import (
    batch_sharding,
    create_mesh,
    parameter_shardings,
    replicate_batch,
    replicated_sharding,
    shard_batch,
    shard_parameters,
    shard_pytree)
