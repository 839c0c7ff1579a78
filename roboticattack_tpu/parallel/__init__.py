from .mesh import (
    batch_sharding,
    make_mesh,
    process_zero,
    replicate,
    replicated,
    shard_batch,
)
