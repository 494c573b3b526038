from .mesh import create_mesh, replicate, shard_batch, shard_moments  # noqa: F401
