from .stencils import laplacian, reflect_pad_hw
from .dst import dirichlet_sine_basis, dst2, idst2
from .deriv import (
    net_and_dnet_dt,
    net_and_dnet_dt_fd,
    net_and_dnet_dt_dummy,
)

__all__ = [
    "laplacian",
    "reflect_pad_hw",
    "dirichlet_sine_basis",
    "dst2",
    "idst2",
    "net_and_dnet_dt",
    "net_and_dnet_dt_fd",
    "net_and_dnet_dt_dummy",
]
