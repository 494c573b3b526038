from .sd_pipeline import SDPipeline, PruningPipeline  # noqa: F401
from .flux_pipeline import FluxPipeline  # noqa: F401
from .safety import SafetyChecker  # noqa: F401
