"""Pallas TPU kernel: fused 5-point Laplacian with reflect boundary.

The stencil in ops/stencils.py compiles to several shifted-add fusions;
this kernel computes the whole reflect-padded stencil in one VMEM pass —
one HBM read + one write per element. Grids at the reference sizes
(64x64, 64x16) fit a single VMEM block, so the kernel runs gridless with
whole-array blocks; larger fields fall back to the XLA stencil (correct
everywhere) via `laplacian_auto`.

Differentiable via custom_vjp: the operator is linear, and its exact
adjoint (not equal to itself — reflect rows fold boundary contributions)
is taken from the XLA stencil's VJP.

Note: at reference grid sizes the XLA stencil fuses into neighbouring
elementwise work and is at least as fast, so physics/ modules default to
ops.stencils.laplacian; this kernel is the standalone fused option (and
the worked Pallas example for the framework).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..stencils import laplacian as xla_laplacian

# one whole-array VMEM block is safe well below ~16MB/core
_VMEM_ELEM_LIMIT = 1 << 20   # 4 MiB of f32


def _lap_kernel(u_ref, out_ref, *, inv_dx2: float):
    u = u_ref[:]                      # (B, H, W)
    h, w = u.shape[-2], u.shape[-1]

    # reflect-neighbour gathers via concatenation (static shapes)
    north = jnp.concatenate([u[:, 1:2, :], u[:, :-1, :]], axis=1)
    south = jnp.concatenate([u[:, 1:, :], u[:, -2:-1, :]], axis=1)
    west = jnp.concatenate([u[:, :, 1:2], u[:, :, :-1]], axis=2)
    east = jnp.concatenate([u[:, :, 1:], u[:, :, -2:-1]], axis=2)
    out_ref[:] = (north + south + west + east - 4.0 * u) * inv_dx2


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def laplacian_pallas(u: jnp.ndarray, dx: float) -> jnp.ndarray:
    """u: (..., H, W) -> 5-point reflect-BC laplacian / dx^2."""
    return _laplacian_pallas_impl(u, dx)


def _laplacian_pallas_impl(u: jnp.ndarray, dx: float) -> jnp.ndarray:
    shape = u.shape
    h, w = shape[-2], shape[-1]
    flat = u.reshape((-1, h, w))
    out = pl.pallas_call(
        partial(_lap_kernel, inv_dx2=1.0 / (dx * dx)),
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY
                               if flat.size > _VMEM_ELEM_LIMIT
                               else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY
                               if flat.size > _VMEM_ELEM_LIMIT
                               else pltpu.VMEM),
    )(flat)
    return out.reshape(shape)


def _fwd(u, dx):
    return _laplacian_pallas_impl(u, dx), None


def _bwd(dx, _, g):
    # The reflect-BC stencil is linear but NOT self-adjoint (boundary rows
    # receive reflected neighbours twice); its exact adjoint is the VJP of
    # the XLA stencil, which is independent of the primal point.
    _, vjp = jax.vjp(lambda x: xla_laplacian(x, dx), jnp.zeros_like(g))
    (du,) = vjp(g)
    return (du,)


laplacian_pallas.defvjp(_fwd, _bwd)


def laplacian_auto(u: jnp.ndarray, dx: float,
                   channels_last: bool = False) -> jnp.ndarray:
    """Pallas kernel on TPU when the array fits one VMEM block, XLA
    stencil otherwise. Drop-in for ops.stencils.laplacian."""
    on_tpu = jax.default_backend() == "tpu"
    h, w = (u.shape[-3], u.shape[-2]) if channels_last else \
        (u.shape[-2], u.shape[-1])
    if not on_tpu or u.size > _VMEM_ELEM_LIMIT:
        return xla_laplacian(u, dx, channels_last=channels_last)
    if channels_last:
        moved = jnp.moveaxis(u, -1, -3)
        return jnp.moveaxis(laplacian_pallas(moved, dx), -3, -1)
    return laplacian_pallas(u, dx)
