from .mesh import create_mesh, shard_batch, replicate  # noqa: F401
