"""PDE residual losses for sampling guidance.

JAX equivalents of the reference guidance losses (reference:
src/diffusion_pde/sampling/pde_losses.py), NHWC layout. The full-physics
LLG residual — which the reference can only evaluate by calling MagTense
per batch element per sampling step (pde_losses.py:198-227) — here reuses
the in-repo field computation (physics.llg.h_effective): one batched,
jittable function shared between data generation, training regularisation,
and guidance.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.stencils import laplacian
from ..physics import llg as llg_phys


def _safe_sqrt(s: jnp.ndarray) -> jnp.ndarray:
    """Elementwise sqrt with a gradient-safe guard at 0 (the reference
    avoids the sqrt(0) NaN-grad by an `if mask.sum() > 0` branch,
    sample.py:339-342; under jit we use the double-where idiom)."""
    pos = s > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, s, 1.0)), 0.0)


def group_sqrt_sum(x: jnp.ndarray, num_items: int = 1) -> jnp.ndarray:
    """Per-item sqrt-of-sum, shape (num_items,).

    The reference computes ``sqrt(sum_batch(...))`` over ONE test item's
    sample batch (sample.py:337-347). When ``num_items`` independent items
    are flattened into one device batch (item k = a contiguous block of
    batch rows), the sqrt must be taken per item — a single global sqrt
    would couple the items' guidance gradients (scale each by the others'
    residual mass). Leading batch axis of ``x`` is split into
    ``num_items`` contiguous groups.
    """
    s = x.reshape(num_items, -1).sum(axis=1)
    return _safe_sqrt(s)


def _safe_sqrt_sum(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(sum(x)) over everything (single-item case)."""
    return group_sqrt_sum(x, 1)[0]


def heat_loss2(u: jnp.ndarray, dudt: jnp.ndarray, labels: jnp.ndarray,
               dx: float, num_items: int = 1) -> jnp.ndarray:
    """Per item: sqrt(sum((du/dt - alpha lap u)^2) / (H W)), alpha =
    labels[:, -1] (reference pde_losses.py:71-96; alpha=1 fallback without
    labels as in the legacy sampler, sample.py:511). u, dudt: (B, H, W, C);
    returns (num_items,)."""
    alpha = (labels[:, -1].reshape(-1, 1, 1, 1)
             if labels is not None else 1.0)
    lap_u = laplacian(u, dx, channels_last=True)
    h, w = u.shape[1], u.shape[2]
    return group_sqrt_sum((dudt - alpha * lap_u) ** 2 / (h * w), num_items)


def llg_loss2(m: jnp.ndarray, dmdt: jnp.ndarray,
              labels: jnp.ndarray | None = None, *_args,
              num_items: int = 1) -> jnp.ndarray:
    """Soft |m| = 1 constraint per item: sqrt(sum((1 - |m|)^2)) / (H W)
    (reference pde_losses.py:99-117). m: (B, H, W, 3); returns
    (num_items,)."""
    norm = jnp.linalg.norm(m, axis=-1)
    h, w = m.shape[1], m.shape[2]
    return group_sqrt_sum((1.0 - norm) ** 2, num_items) / (h * w)


def llg_residual_loss(
    m: jnp.ndarray,
    dmdt: jnp.ndarray,
    labels: jnp.ndarray,
    kernel,
    params: llg_phys.LLGParams | None = None,
    t_per_step: float = 4e-12,
    num_items: int = 1,
) -> jnp.ndarray:
    """Full-physics LLG guidance (reference pde_losses.py:119-257 with
    MagTense in the loop; here fully on-device and differentiable).

    labels[:, -3:] is the external field in mT (reference label layout for
    llg datasets, conf/dataset/llg_eq_joint.yaml net.label_ch=4 = time + 3
    field components). Returns the scalar sqrt-sum residual between dm/dt
    (per output step) and the LLG right-hand side, normalised by cell
    count, matching the heat_loss2 shape of guidance terms.
    """
    params = params or llg_phys.LLGParams()
    h_ext = labels[:, -3:].reshape(-1, 1, 1, 3) / (1000.0 * llg_phys.MU0)
    h_eff = llg_phys.h_effective(m, h_ext, kernel, params)
    rhs = llg_phys.llg_rhs(m, h_eff, params)
    h, w = m.shape[1], m.shape[2]
    return group_sqrt_sum((dmdt - rhs * t_per_step) ** 2, num_items) / (h * w)
