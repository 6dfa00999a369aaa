"""dpde_tpu — TPU-native dynamical-PDE diffusion framework.

A from-scratch JAX/Flax/Pallas re-design with the capabilities of the
reference cmt-dtu-energy/dynamical-pde-diffusion (PyTorch/CUDA/MagTense):
EDM diffusion models over 2D PDE field snapshots (heat equation, LLG
micromagnetics) with physics-informed training losses and PDE-residual
guided sampling, plus on-device data generation replacing MagTense.
"""

from . import data, models, ops, parallel, physics, training, utils

__all__ = ["data", "models", "ops", "parallel", "physics", "training",
           "utils"]
__version__ = "0.1.0"
