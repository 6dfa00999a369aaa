from .unet import EDMUNet, SmallUnet, PositionalEmbedding, ResBlock
from .precond import Denoiser, edm_precondition
from .ema import EMAConfig, ema_decay, ema_update
from .losses import EDMLoss, EDMHeatLoss
from .factory import (
    build_net_from_config,
    build_loss_from_config,
    init_denoiser,
)

__all__ = [
    "EDMUNet",
    "SmallUnet",
    "PositionalEmbedding",
    "ResBlock",
    "Denoiser",
    "edm_precondition",
    "EMAConfig",
    "ema_decay",
    "ema_update",
    "EDMLoss",
    "EDMHeatLoss",
    "build_net_from_config",
    "build_loss_from_config",
    "init_denoiser",
]
