from .sd_pipeline import SDPipeline, PruningPipeline  # noqa: F401
