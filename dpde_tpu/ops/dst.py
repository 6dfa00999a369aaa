"""Discrete sine transform as MXU matmuls.

The reference implements the interior Dirichlet DST as two matmuls
``S @ U @ S^T`` (reference: src/diffusion_pde/pdes/heat.py:19-57). That is
already the right formulation for TPU — dense matmuls map straight onto the
MXU — so the same math is kept, expressed with einsum over channels-last
batches and computed in float32 with explicit ``preferred_element_type``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def dirichlet_sine_basis(n_int: int, lx: float = 1.0, ly: float = 1.0,
                         dtype=jnp.float32):
    """Orthonormal sine basis for ``n_int`` interior points and 2D modal
    Laplacian eigenvalues (reference heat.py:19-40).

    S[j, n] = sqrt(2/(N+1)) * sin(pi j n / (N+1)),  j, n = 1..N
    lam2d[j, k] = (pi j / Ly)^2 + (pi k / Lx)^2
    """
    if n_int <= 0:
        raise ValueError(f"n_int must be >= 1, got {n_int}")
    n = np.arange(1, n_int + 1, dtype=np.float64)
    s = math.sqrt(2.0 / (n_int + 1)) * np.sin(
        math.pi * np.outer(n, n) / (n_int + 1)
    )
    lam_x = (math.pi * n / lx) ** 2
    lam_y = (math.pi * n / ly) ** 2
    lam2d = lam_y[:, None] + lam_x[None, :]
    return jnp.asarray(s, dtype=dtype), jnp.asarray(lam2d, dtype=dtype)


import jax

# The solver is an *exact* integrator used to make training data; run its
# matmuls at full fp32 on the MXU (TPU default would be bf16 inputs).
_PREC = jax.lax.Precision.HIGHEST


def dst2(u: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Forward 2D DST on the trailing (H, W) dims: ``S @ U @ S^T``.

    ``S`` is symmetric and involutory for the orthonormal sine basis, so the
    same matmul pair also inverts the transform; :func:`idst2` exists for
    readability.
    """
    tmp = jnp.einsum("jh,...hw->...jw", s, u, precision=_PREC,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("...jw,kw->...jk", tmp, s, precision=_PREC,
                      preferred_element_type=jnp.float32)


def idst2(u_hat: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Inverse 2D DST: ``S^T @ U_hat @ S`` (== :func:`dst2` for symmetric S)."""
    tmp = jnp.einsum("...jk,kw->...jw", u_hat, s, precision=_PREC,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("jh,...jw->...hw", s, tmp, precision=_PREC,
                      preferred_element_type=jnp.float32)
