from .karras import SamplerConfig, karras_sigmas
from .samplers import (
    UnconditionalSampler,
    JointSampler,
    ForwardConditionedSampler,
)
from . import pde_losses
from ..ops.deriv import (
    net_and_dnet_dt,
    net_and_dnet_dt_fd,
    net_and_dnet_dt_dummy,
)

__all__ = [
    "SamplerConfig",
    "karras_sigmas",
    "UnconditionalSampler",
    "JointSampler",
    "ForwardConditionedSampler",
    "pde_losses",
    "net_and_dnet_dt",
    "net_and_dnet_dt_fd",
    "net_and_dnet_dt_dummy",
]
