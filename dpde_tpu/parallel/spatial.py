"""Spatial (halo-exchange) sharding for large grids.

The reference's grids (64x64, 64x16) fit one chip, so the production
training path is pure data parallelism (parallel/mesh.py). This module is
the scaling path for *large* fields — the analogue of sequence/context
parallelism for grid PDEs (SURVEY.md section 5 "long-context" row): shard
the H dimension of a field across the mesh with `shard_map`, exchange
one-row halos with `lax.ppermute` over the ICI ring, and apply the stencil
locally. Used by the physics solvers when a grid exceeds one chip's HBM
(e.g. on-TPU datagen at 4096^2) — compute stays local, communication is
two rows per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _halo_exchange(u_local: jnp.ndarray, axis: str):
    """Fetch the neighbouring row of the H-sharded field from both ring
    neighbours. u_local: (..., H_local, W). Returns (up_row, down_row)
    with edge shards receiving their own boundary row (reflect outside)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    top = u_local[..., :1, :]     # first local row
    bot = u_local[..., -1:, :]    # last local row

    # send my top row to the previous shard (their "below" halo),
    # my bottom row to the next shard (their "above" halo)
    from_above = jax.lax.ppermute(
        bot, axis, [(i, (i + 1) % n) for i in range(n)])
    from_below = jax.lax.ppermute(
        top, axis, [(i, (i - 1) % n) for i in range(n)])

    # reflect BC at the global edges: torch-style reflect means the halo
    # row outside the domain equals the row *one inside* the edge
    reflect_top = u_local[..., 1:2, :]
    reflect_bot = u_local[..., -2:-1, :]
    above = jnp.where(idx == 0, reflect_top, from_above)
    below = jnp.where(idx == n - 1, reflect_bot, from_below)
    return above, below


def _sharded_laplacian_local(u_local: jnp.ndarray, dx: float, axis: str
                             ) -> jnp.ndarray:
    """Local 5-point stencil with halo rows; W (unsharded) uses reflect."""
    above, below = _halo_exchange(u_local, axis)
    up = jnp.concatenate([above, u_local[..., :-1, :]], axis=-2)
    down = jnp.concatenate([u_local[..., 1:, :], below], axis=-2)
    west = jnp.concatenate([u_local[..., :, 1:2], u_local[..., :, :-1]],
                           axis=-1)
    east = jnp.concatenate([u_local[..., :, 1:], u_local[..., :, -2:-1]],
                           axis=-1)
    return (up + down + west + east - 4.0 * u_local) / (dx * dx)


def sharded_laplacian(mesh: Mesh, u: jnp.ndarray, dx: float,
                      axis: str = "data") -> jnp.ndarray:
    """Reflect-BC 5-point laplacian of u (..., H, W) with H sharded over
    `axis`. Semantics match ops.stencils.laplacian exactly."""
    ndim = u.ndim
    spec = P(*([None] * (ndim - 2)), axis, None)
    fn = shard_map(
        partial(_sharded_laplacian_local, dx=dx, axis=axis),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
    )
    return fn(u)


def shard_field(mesh: Mesh, u: jnp.ndarray, axis: str = "data"):
    """device_put with H (second-to-last dim) sharded over the mesh."""
    ndim = u.ndim
    spec = P(*([None] * (ndim - 2)), axis, None)
    return jax.device_put(u, NamedSharding(mesh, spec))
