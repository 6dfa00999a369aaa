"""On-device pytree EMA.

The reference keeps an EMA shadow model on the CPU and syncs GPU->CPU every
step (reference: nets.py:370-419, training_loop.py:80-81) — a host/device
ping-pong that would stall a TPU step. Here the EMA is a parameter pytree
living in the jitted train state: `ema = d * ema + (1 - d) * p` fuses into
the update step with zero transfers. The decay warmup schedule matches the
reference: d_eff = 1 - min(1, n/warmup) * (1 - decay) (nets.py:395-400),
and `update_every` gates updates by step count (nets.py:406-408).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EMAConfig:
    decay: float = 0.999
    warmup_steps: int = 0
    update_every: int = 1


def ema_decay(cfg: EMAConfig, num_updates: jnp.ndarray) -> jnp.ndarray:
    """Warmup-ramped decay (reference nets.py:395-400)."""
    if cfg.warmup_steps <= 0:
        return jnp.asarray(cfg.decay, dtype=jnp.float32)
    frac = jnp.minimum(1.0, num_updates.astype(jnp.float32)
                       / cfg.warmup_steps)
    return 1.0 - frac * (1.0 - cfg.decay)


def ema_update(cfg: EMAConfig, ema_params, params, step: jnp.ndarray):
    """One EMA step; `step` is the 1-based update counter."""
    d = ema_decay(cfg, step)

    def upd(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return d * e + (1.0 - d) * p
        return p

    new = jax.tree_util.tree_map(upd, ema_params, params)
    if cfg.update_every > 1:
        do = (step % cfg.update_every) == 0
        new = jax.tree_util.tree_map(
            lambda n, e: jnp.where(do, n, e), new, ema_params)
    return new
