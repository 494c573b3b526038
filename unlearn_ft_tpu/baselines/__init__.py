from .uce import uce_edit  # noqa: F401
from .esd import make_esd_step, esd_param_mask  # noqa: F401
from .concept_prune import wanda_masks, apply_neuron_masks  # noqa: F401
