"""EDM preconditioning and denoiser binding.

Functional re-design of the reference's EDMWrapper module
(reference: src/diffusion_pde/models/nets.py:343-366): the preconditioner

    c_skip = sd^2 / (s^2 + sd^2);  c_out = s sd / sqrt(s^2 + sd^2)
    c_in   = 1 / sqrt(s^2 + sd^2); c_noise = log(s) / 4
    D(x)   = c_skip x + c_out F(c_in x, c_noise, ...)

is a pure function of (apply_fn, params), and :class:`Denoiser` binds the
two into the ``net(x, sigma, labels, obs)`` callable that losses and
samplers consume. Keeping the denoiser a pytree (params are a leaf) means
``jax.jit``/``jax.grad`` treat parameter updates as data, not recompiles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp


def edm_precondition(
    apply_fn: Callable,
    params: Any,
    x: jnp.ndarray,
    sigma: jnp.ndarray,
    labels: jnp.ndarray | None = None,
    obs: jnp.ndarray | None = None,
    sigma_data: float = 0.5,
    train: bool = False,
    rngs: dict | None = None,
) -> jnp.ndarray:
    """Apply the EDM-preconditioned denoiser. x is NHWC; sigma is (B,)."""
    s = jnp.reshape(sigma, (-1, 1, 1, 1)).astype(jnp.float32)
    sd2 = sigma_data ** 2
    c_skip = sd2 / (s ** 2 + sd2)
    c_out = s * sigma_data / jnp.sqrt(s ** 2 + sd2)
    c_in = 1.0 / jnp.sqrt(s ** 2 + sd2)
    c_noise = jnp.log(jnp.reshape(sigma, (-1,))) / 4.0

    kwargs = {}
    if rngs is not None:
        kwargs["rngs"] = rngs
    f_x = apply_fn(params, c_in * x, c_noise, labels, obs, train=train,
                   **kwargs)
    return c_skip * x + c_out * f_x


@jax.tree_util.register_pytree_node_class
@dataclass
class Denoiser:
    """Bound EDM denoiser: ``net(x, sigma, labels=None, obs=None)``.

    ``apply_fn`` and ``sigma_data`` are static; ``params`` is a pytree leaf
    so a Denoiser can be passed straight through jit/grad/scan.
    """

    apply_fn: Callable
    params: Any
    sigma_data: float = 0.5

    def __call__(self, x, sigma, labels=None, obs=None, train=False,
                 rngs=None):
        return edm_precondition(self.apply_fn, self.params, x, sigma,
                                labels, obs, sigma_data=self.sigma_data,
                                train=train, rngs=rngs)

    def replace_params(self, params) -> "Denoiser":
        return Denoiser(self.apply_fn, params, self.sigma_data)

    # pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        return (self.params,), (self.apply_fn, self.sigma_data)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], aux[1])
