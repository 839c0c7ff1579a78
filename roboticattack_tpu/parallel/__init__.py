from .mesh import (
    batch_sharding,
    make_mesh,
    make_serving_mesh,
    process_zero,
    replicate,
    replicated,
    shard_batch,
)
from .distributed import initialize_multihost
from .sharding import llama_param_specs, shard_params, vla_param_specs
