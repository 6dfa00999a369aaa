"""Training losses: EDM and physics-informed (PIDM) variants.

Functional JAX re-design of the reference loss classes (reference:
src/diffusion_pde/models/loss.py). Differences from the reference shape:

  * losses are pure functions of (net, rng key, batch) returning
    (per_sample_loss, aux_metrics) — the wandb logging side-effects of the
    reference (loss.py:32-33,164-169) move to the training loop;
  * the PIDM time derivative uses jax.jvp (exact, ~2 forward-equivalents)
    instead of the 3-forward finite difference (loss.py:143 ->
    sample.py:21-66); the derivative is stop-gradient, matching the
    reference's detach (loss.py:144);
  * layout is NHWC, so channel slicing is on the last axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.deriv import net_and_dnet_dt, net_and_dnet_dt_fd
from ..ops.stencils import laplacian


def _reduce(x: jnp.ndarray, method: str) -> jnp.ndarray:
    if method == "mean":
        return x.mean(axis=(1, 2, 3))
    if method == "sum":
        return x.sum(axis=(1, 2, 3))
    raise ValueError(f"unknown reduce method {method}")


@dataclass(frozen=True)
class EDMLoss:
    """EDM score-matching loss (loss.py:13-37, from NVlabs/edm):
    sigma ~ exp(N(P_mean, P_std)), weight = (s^2+sd^2)/(s sd)^2,
    loss = weight * (D(x + n) - x)^2."""

    p_mean: float = -1.2
    p_std: float = 1.2
    sigma_data: float = 0.5
    reduce_method: str = "mean"

    def __call__(self, net: Callable, key: jax.Array, x: jnp.ndarray,
                 labels: jnp.ndarray | None, obs: jnp.ndarray | None = None,
                 train: bool = True, rngs: dict | None = None):
        k_sigma, k_noise = jax.random.split(key)
        b = x.shape[0]
        rnd = jax.random.normal(k_sigma, (b, 1, 1, 1))
        sigma = jnp.exp(rnd * self.p_std + self.p_mean)
        sd = self.sigma_data
        weight = (sigma ** 2 + sd ** 2) / (sigma * sd) ** 2
        n = jax.random.normal(k_noise, x.shape) * sigma
        d_yn = net(x + n, sigma.reshape(-1), labels, obs, train=train,
                   rngs=rngs)
        loss = weight * (d_yn - x) ** 2
        per_sample = _reduce(loss, self.reduce_method)
        return per_sample, {"Loss/train/batch/EDM": loss.mean()}


@dataclass(frozen=True)
class EDMHeatLoss:
    """Physics-Informed Diffusion Model loss for the heat equation
    (loss.py:41-171; PIDM, arXiv:2403.14404). ME evaluates the heat
    residual on the denoised estimate; SE first runs a short first-order
    EDM rollout (loss.py:78-135). The residual uses du/dt from the time
    label derivative and alpha = labels[:, 1] (loss.py:154).

    Fixes a latent broadcast bug in the reference's PDE weighting
    (loss.py:157/160): ``pde_loss.mean(dim=(1,2,3))`` is (B,) but is
    divided by ``sigma ** 2`` of shape (B,1,1,1), broadcasting to a
    (B,1,1,B) cross matrix — every sample's PDE residual gets scaled by
    every OTHER sample's noise level, and the subsequent
    ``edm_loss + pde_loss`` silently inflates to (B,1,1,B) before the
    trainer's final mean. Here ``sigma.reshape(-1)`` keeps the weight
    per-sample, shape (B,)."""

    dx: float
    pde_loss_coeff: float = 1.0
    method: str = "joint"              # 'joint' (ch_a=1) or 'forward' (0)
    residual_estimation: str = "ME"    # 'ME' or 'SE'
    p_mean: float = -1.2
    p_std: float = 1.2
    sigma_data: float = 0.5
    reduce_method: str = "mean"
    sigma_min: float = 0.01
    rho: float = 7.0
    steps: int = 2
    time_derivative: str = "jvp"       # 'jvp' or 'fd' (parity option)

    @property
    def ch_a(self) -> int:
        return 1 if self.method == "joint" else 0

    def _two_step_sample(self, net, x, sigma, labels, obs, train,
                         rngs=None):
        """Short first-order rollout from per-sample sigma to sigma_min
        (loss.py:78-135)."""
        b = x.shape[0]
        s_max = sigma.reshape(b)
        idx = jnp.arange(self.steps + 1, dtype=jnp.float32)
        inv_rho = 1.0 / self.rho
        s_seq = (s_max[:, None] ** inv_rho
                 + idx[None, :] / self.steps
                 * (self.sigma_min ** inv_rho - s_max[:, None] ** inv_rho)
                 ) ** self.rho                                  # (B, steps+1)
        x_next = x
        for i in range(self.steps):
            s_cur = s_seq[:, i].reshape(b, 1, 1, 1)
            s_nxt = s_seq[:, i + 1].reshape(b, 1, 1, 1)
            d_x = net(x_next, s_seq[:, i], labels, obs, train=train,
                      rngs=rngs)
            x_next = x_next + (s_nxt - s_cur) * (x_next - d_x) / s_cur
        return x_next

    def __call__(self, net: Callable, key: jax.Array, x: jnp.ndarray,
                 labels: jnp.ndarray | None, obs: jnp.ndarray | None = None,
                 train: bool = True, rngs: dict | None = None):
        k_sigma, k_noise = jax.random.split(key)
        b = x.shape[0]
        rnd = jax.random.normal(k_sigma, (b, 1, 1, 1))
        sigma = jnp.exp(rnd * self.p_std + self.p_mean)
        sd = self.sigma_data
        weight = (sigma ** 2 + sd ** 2) / (sigma * sd) ** 2
        n = jax.random.normal(k_noise, x.shape) * sigma

        bound = lambda xx, ss, ll: net(xx, ss, ll, obs, train=train,
                                       rngs=rngs)
        deriv = (net_and_dnet_dt if self.time_derivative == "jvp"
                 else net_and_dnet_dt_fd)
        d_yn, dxdt = deriv(bound, x + n, sigma.reshape(-1), labels)
        dudt = dxdt[..., self.ch_a:]                  # NHWC channel slice
        edm_loss = weight * (d_yn - x) ** 2

        if self.residual_estimation == "ME":
            x0_star = d_yn
        elif self.residual_estimation == "SE":
            x0_star = self._two_step_sample(net, d_yn, sigma, labels, obs,
                                            train, rngs=rngs)
        else:
            raise ValueError(self.residual_estimation)

        alpha = labels[:, 1].reshape(-1, 1, 1, 1)
        lap_u = laplacian(x0_star[..., self.ch_a:], self.dx,
                          channels_last=True)
        h, w = x.shape[1], x.shape[2]
        pde = (dudt - alpha * lap_u) ** 2 / (h * w)

        edm_ps = _reduce(edm_loss, self.reduce_method)
        pde_ps = (_reduce(pde, self.reduce_method)
                  * self.pde_loss_coeff / sigma.reshape(-1) ** 2)
        total = edm_ps + pde_ps
        return total, {
            "Loss/train/batch/EDM": edm_ps.mean(),
            "Loss/train/batch/PDE": pde_ps.mean(),
            "Loss/train/batch/Total": total.mean(),
        }
