from .losses import (  # noqa: F401
    contrastive_loss,
    resource_loss,
    diffusion_loss,
    distillation_loss,
    block_distillation_loss,
    esd_negative_guidance_target,
)
