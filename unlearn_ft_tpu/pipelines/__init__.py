from .sd_pipeline import SDPipeline, PruningPipeline, SDXLPruningPipeline  # noqa: F401
from .flux_pipeline import FluxPipeline, FluxPruningPipeline  # noqa: F401
from .safety import SafetyChecker  # noqa: F401
