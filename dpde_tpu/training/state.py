"""Train state and the jitted data-parallel train step.

Re-design of the reference per-batch loop body (reference:
src/diffusion_pde/training/training_loop.py:63-81): one fused jitted step
computes loss, grads, optax update (adam + optional global-norm clip,
matching torch clip_grad_norm_), and the on-device EMA update. Under a
``Mesh(('data',))`` the batch arrives sharded on its leading axis and
parameters replicated; XLA emits the ICI gradient all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.ema import EMAConfig, ema_update


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray          # scalar int32


def make_optimizer(lr: float, weight_decay: float = 0.0,
                   grad_clip: float | None = None) -> optax.GradientTransformation:
    """Adam(+wd) with optional clip-by-global-norm (training_loop.py:46,74-76)."""
    tx = []
    if grad_clip is not None:
        tx.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay > 0.0:
        tx.append(optax.adamw(lr, weight_decay=weight_decay))
    else:
        tx.append(optax.adam(lr))
    return optax.chain(*tx)


def init_train_state(params: Any, tx: optax.GradientTransformation
                     ) -> TrainState:
    # Copy params into the state: the train step donates its input state,
    # and device_put-with-same-sharding aliases buffers, so reusing the
    # caller's arrays directly would free them on the first step. The copy
    # goes through the host — per-leaf on-device copies would trigger one
    # tiny TPU compile per parameter shape (minutes on a remote-compile
    # tunnel); a host round-trip of a few hundred MB is milliseconds.
    import numpy as np

    host = jax.tree_util.tree_map(np.asarray, params)
    fresh = lambda: jax.tree_util.tree_map(
        lambda a: jax.device_put(a.copy()), host)
    params = fresh()
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        ema_params=fresh(),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(denoiser_template, loss_fn: Callable,
                    tx: optax.GradientTransformation,
                    ema_cfg: EMAConfig, jit: bool = True) -> Callable:
    """Build the train step (jitted by default; ``jit=False`` returns the
    raw body for embedding into a larger program — e.g. the whole-epoch
    scan in data.device_pipeline).

    denoiser_template: a Denoiser whose params are swapped per step.
    loss_fn(net, key, x, labels, obs) -> (per_sample_loss, metrics).
    """

    def loss_of_params(params, key, x, labels, obs):
        net = denoiser_template.replace_params(params)
        # a dedicated dropout stream so configs with model.dropout > 0
        # train (flax raises without it); harmless when dropout == 0
        k_loss, k_drop = jax.random.split(key)
        per_sample, aux = loss_fn(net, k_loss, x, labels, obs, train=True,
                                  rngs={"dropout": k_drop})
        return per_sample.mean(), aux

    def train_step(state: TrainState, key, x, labels, obs):
        (loss, aux), grads = jax.value_and_grad(
            loss_of_params, has_aux=True)(state.params, key, x, labels, obs)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        ema_params = ema_update(ema_cfg, state.ema_params, params, step)
        aux = dict(aux)
        aux["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, ema_params, step), loss, aux

    if not jit:
        return train_step
    return partial(jax.jit, donate_argnums=(0,))(train_step)


def make_eval_step(denoiser_template, loss_fn: Callable,
                   jit: bool = True) -> Callable:
    """Validation step on given params (EMA params in practice,
    training_loop.py:90-112)."""

    def eval_step(params, key, x, labels, obs):
        net = denoiser_template.replace_params(params)
        per_sample, _ = loss_fn(net, key, x, labels, obs, train=False)
        return per_sample.mean()

    return jax.jit(eval_step) if jit else eval_step
