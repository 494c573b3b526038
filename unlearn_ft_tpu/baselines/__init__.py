from .uce import uce_edit  # noqa: F401
from .esd import make_esd_step, esd_param_mask, masked_optimizer  # noqa: F401
from .concept_prune import wanda_masks, apply_neuron_masks  # noqa: F401
from .magnitude import magnitude_arch_vector  # noqa: F401
