"""Karras sigma schedule.

The grid is computed on the host in float64 (the reference keeps its whole
sampler state in fp64 for this reason, reference sample.py:189,276; TPU
fp64 is emulated and slow, so only the *schedule* is fp64 — SURVEY.md
section 7 'hard parts') and handed to the device as float32 constants:

    sigma_i = (smax^(1/rho) + i/(N-1) (smin^(1/rho) - smax^(1/rho)))^rho
    sigma_N = 0
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class SamplerConfig:
    num_steps: int = 18
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0


def karras_sigmas(num_steps: int, sigma_min: float = 0.002,
                  sigma_max: float = 80.0, rho: float = 7.0) -> np.ndarray:
    """(num_steps + 1,) float64 descending schedule with final 0
    (reference sample.py:209-212)."""
    i = np.arange(num_steps, dtype=np.float64)
    sig = (sigma_max ** (1 / rho)
           + i / (num_steps - 1)
           * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    return np.concatenate([sig, np.zeros(1)])
