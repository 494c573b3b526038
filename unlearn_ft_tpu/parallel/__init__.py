from .mesh import (  # noqa: F401
    create_mesh,
    replicate,
    shard_batch,
    shard_moments,
    shard_params,
)
