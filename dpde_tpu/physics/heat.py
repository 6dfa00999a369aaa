"""Pseudospectral 2D heat-equation solver and dataset generator.

JAX re-design of the reference generator
(reference: src/diffusion_pde/pdes/heat.py, heat_no_cond.py):

  u_t = alpha * (u_xx + u_yy)  on [0,Lx]x[0,Ly],  u|boundary = a + b x + c y

solved exactly by lifting the linear Dirichlet boundary field and evolving
the interior residual in the sine (DST) basis with per-mode exponential
decay (heat.py:107-169). TPU-first changes vs the reference:

  * the per-blob Python loops of ``random_gaussian_blobs`` (heat.py:71-101)
    become a fixed-size masked einsum — every sample draws MAX_BLOBS blob
    parameter sets and inactive blobs are zero-masked, so the whole IC batch
    is one fused elementwise expression (static shapes, no host loop);
  * time stepping is ``lax.scan`` over per-step modal decays; batch is
    ``vmap``-free (plain leading batch dim, everything broadcasts);
  * all randomness is threaded through ``jax.random`` keys.

Returns match the reference HDF5 schema: U (N, 1, S, S, T+1) NCHW-T with
A (N, 1, S, S), t_steps (T+1,), labels (N, 1) = alpha.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dst import dirichlet_sine_basis, dst2, idst2


def make_grid(s: int, lx: float = 1.0, ly: float = 1.0, dtype=jnp.float32):
    """Full (S, S) grid including boundaries (reference heat.py:10-17)."""
    x = jnp.linspace(0.0, lx, s, dtype=dtype)
    y = jnp.linspace(0.0, ly, s, dtype=dtype)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    return xx, yy


def linear_bc_field(a, b, c, xx, yy):
    """w = a + b x + c y, batched: a,b,c (B,) -> (B, S, S)
    (reference heat.py:62-66)."""
    return (a[:, None, None] + b[:, None, None] * xx[None]
            + c[:, None, None] * yy[None])


def random_gaussian_blobs(
    key: jax.Array,
    batch: int,
    xx: jnp.ndarray,
    yy: jnp.ndarray,
    n_blobs: tuple[int, int] = (1, 3),
    amp_range: tuple[float, float] = (0.5, 1.0),
    sigma_range: tuple[float, float] = (0.03, 0.15),
) -> jnp.ndarray:
    """Batched sum-of-Gaussians ICs (reference heat.py:71-101), with the
    per-sample blob count handled by masking a fixed MAX_BLOBS axis instead
    of data-dependent loops (XLA needs static shapes)."""
    lo, hi = int(n_blobs[0]), int(n_blobs[1])
    max_blobs = hi
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    count = jax.random.randint(k1, (batch,), lo, hi + 1)  # blobs per sample
    cx = jax.random.uniform(k2, (batch, max_blobs))
    cy = jax.random.uniform(k3, (batch, max_blobs))
    sx = jax.random.uniform(k4, (batch, max_blobs, 2),
                            minval=sigma_range[0], maxval=sigma_range[1])
    amp = jax.random.uniform(k5, (batch, max_blobs),
                             minval=amp_range[0], maxval=amp_range[1])
    sign = jnp.where(jax.random.uniform(k6, (batch, max_blobs)) < 0.5,
                     -1.0, 1.0)
    active = (jnp.arange(max_blobs)[None, :] < count[:, None]).astype(xx.dtype)

    # (B, K, S, S) gaussian stack -> masked sum over K
    dx2 = (xx[None, None] - cx[:, :, None, None]) ** 2
    dy2 = (yy[None, None] - cy[:, :, None, None]) ** 2
    g = jnp.exp(-(dx2 / (2 * sx[:, :, 0, None, None] ** 2)
                  + dy2 / (2 * sx[:, :, 1, None, None] ** 2)))
    w = (amp * sign * active)[:, :, None, None]
    return jnp.sum(w * g, axis=1)


def _apply_linear_bc(u0, w):
    """Force the boundary ring of u0 to the lift w (reference heat.py:136-140)."""
    u = u0
    u = u.at[:, 0, :].set(w[:, 0, :])
    u = u.at[:, -1, :].set(w[:, -1, :])
    u = u.at[:, :, 0].set(w[:, :, 0])
    u = u.at[:, :, -1].set(w[:, :, -1])
    return u


@partial(jax.jit, static_argnames=("s", "steps", "n_blobs"))
def heat_timeseries_linear_bc(
    key: jax.Array,
    alpha: jnp.ndarray,   # (B,)
    a: jnp.ndarray,       # (B,)
    b: jnp.ndarray,       # (B,)
    c: jnp.ndarray,       # (B,)
    dt: jnp.ndarray,      # (steps,)
    s: int,
    steps: int,
    s_int: jnp.ndarray,
    lam2d_int: jnp.ndarray,
    xx: jnp.ndarray,
    yy: jnp.ndarray,
    n_blobs: tuple[int, int] = (1, 3),
) -> jnp.ndarray:
    """Exact heat evolution with linear Dirichlet BCs via lifting + interior
    DST (reference heat.py:107-169). Returns (B, S, S, steps+1)."""
    batch = alpha.shape[0]
    w = linear_bc_field(a, b, c, xx, yy)
    u0 = _apply_linear_bc(
        random_gaussian_blobs(key, batch, xx, yy, n_blobs=n_blobs), w
    )

    v0_in = (u0 - w)[:, 1:-1, 1:-1]
    v_hat0 = dst2(v0_in, s_int)

    alpha_b = alpha[:, None, None]

    def step(v_hat, dt_n):
        v_hat = v_hat * jnp.exp(-alpha_b * lam2d_int[None] * dt_n)
        v_in = idst2(v_hat, s_int)
        u_t = jnp.pad(v_in, ((0, 0), (1, 1), (1, 1))) + w
        return v_hat, u_t

    _, u_series = jax.lax.scan(step, v_hat0, dt)          # (steps, B, S, S)
    u_all = jnp.concatenate([u0[None], u_series], axis=0)  # (steps+1, B, S, S)
    return jnp.moveaxis(u_all, 0, -1)                      # (B, S, S, steps+1)


def generate_heat(
    key: jax.Array,
    n: int,
    batch: int,
    s: int,
    steps: int,
    dt: np.ndarray,
    lx: float = 1.0,
    ly: float = 1.0,
    alpha_logrange: tuple[float, float] = (-2.0, 0.0),
    n_blobs: tuple[int, int] = (1, 3),
):
    """Generate the full heat dataset in device-sized chunks
    (reference heat.py:175-231). Returns (U, A, t_steps, labels) numpy arrays
    in the reference schema layout."""
    xx, yy = make_grid(s, lx, ly)
    s_int, lam2d_int = dirichlet_sine_basis(s - 2, lx, ly)
    dt_j = jnp.asarray(dt, dtype=jnp.float32)

    u_out = np.empty((n, 1, s, s, steps + 1), dtype=np.float32)
    labels = np.empty((n, 1), dtype=np.float32)

    start = 0
    while start < n:
        this_b = min(batch, n - start)
        key, k_alpha, k_abc, k_ic = jax.random.split(key, 4)
        lo, hi = alpha_logrange
        alpha = jnp.exp(jax.random.uniform(k_alpha, (this_b,),
                                           minval=lo, maxval=hi))
        abc = jax.random.uniform(k_abc, (3, this_b), minval=-0.5, maxval=0.5)
        u_ts = heat_timeseries_linear_bc(
            k_ic, alpha, abc[0], abc[1], abc[2], dt_j, s, steps,
            s_int, lam2d_int, xx, yy, n_blobs=n_blobs,
        )
        u_out[start:start + this_b, 0] = np.asarray(u_ts)
        labels[start:start + this_b, 0] = np.asarray(alpha)
        start += this_b

    a_out = u_out[..., 0]
    t_steps = np.concatenate(
        [np.zeros(1, dtype=np.float32),
         np.asarray(dt, dtype=np.float32).cumsum()]
    )
    return u_out, a_out, t_steps, labels


def generate_heat_no_cond(
    key: jax.Array,
    n: int,
    t_final: float,
    s: int,
    lx: float = 1.0,
    ly: float = 1.0,
    batch: int = 64,
    n_blobs: tuple[int, int] = (4, 8),
):
    """Single-jump variant: only (t=0, t=T) with alpha=1 fixed
    (reference heat_no_cond.py:10-106). Returns U of shape (N, 1, S, S, 2)."""
    dt = np.asarray([t_final], dtype=np.float32)
    u, _, _, _ = generate_heat(
        key, n, batch, s, 1, dt, lx, ly,
        alpha_logrange=(0.0, 0.0),  # exp(0) = 1, matching fixed alpha=1
        n_blobs=n_blobs,
    )
    t_steps = np.array([0.0, t_final], dtype=np.float32)
    return u, u[..., 0], t_steps


def time_grid(steps: int, t_final: float, spacing: str = "linear") -> np.ndarray:
    """Time stamps incl. t=0 (reference heat.py:251-256)."""
    if spacing == "linear":
        return np.linspace(0.0, t_final, steps + 1, dtype=np.float32)
    if spacing == "log":
        return np.logspace(-4, math.log10(t_final), steps + 1,
                           dtype=np.float32)
    raise ValueError(f"Unknown t_spacing: {spacing}")
