from .common import DiffusionSchedule, make_betas  # noqa: F401
from .ddim import ddim_timesteps, ddim_step  # noqa: F401
from .ddpm import ddpm_step  # noqa: F401
from .pndm import PNDMState, pndm_timesteps, pndm_init, pndm_step  # noqa: F401
from .flow_match import FlowMatchSchedule, flow_match_step  # noqa: F401
