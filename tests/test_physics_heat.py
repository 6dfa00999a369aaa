"""Heat spectral solver vs analytic modal decay (SURVEY.md section 4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpde_tpu.ops import dirichlet_sine_basis, dst2, idst2
from dpde_tpu.physics import heat as H


def test_modal_decay_exact():
    s = 64
    alpha, t_final = 0.3, 0.1
    xx, yy = H.make_grid(s)
    s_mat, lam2d = dirichlet_sine_basis(s - 2)
    x_int = np.asarray(xx)[1:-1, 1:-1]
    y_int = np.asarray(yy)[1:-1, 1:-1]
    u0 = np.sin(2 * np.pi * x_int) * np.sin(3 * np.pi * y_int)
    decayed = idst2(dst2(jnp.asarray(u0)[None], s_mat)
                    * jnp.exp(-alpha * lam2d * t_final), s_mat)
    exact = u0 * np.exp(-alpha * ((2 * np.pi) ** 2 + (3 * np.pi) ** 2)
                        * t_final)
    np.testing.assert_allclose(np.asarray(decayed)[0], exact, atol=1e-6)


def test_generate_heat_schema_and_bcs():
    key = jax.random.PRNGKey(0)
    dt = np.diff(H.time_grid(8, 0.5))
    u, a, t_steps, labels = H.generate_heat(key, n=6, batch=4, s=32, steps=8,
                                            dt=dt)
    assert u.shape == (6, 1, 32, 32, 9)
    assert a.shape == (6, 1, 32, 32)
    assert t_steps.shape == (9,)
    assert labels.shape == (6, 1)
    assert np.isfinite(u).all()
    np.testing.assert_allclose(a, u[..., 0])
    # Dirichlet boundary is static in time
    np.testing.assert_allclose(u[:, 0, 0, :, -1], u[:, 0, 0, :, 0], atol=1e-6)
    np.testing.assert_allclose(u[:, 0, :, -1, -1], u[:, 0, :, -1, 0],
                               atol=1e-6)
    # t grid monotonic starting at 0 (reference notebooks/00_testing checks)
    assert t_steps[0] == 0.0
    assert np.all(np.diff(t_steps) > 0)


def test_generate_heat_semigroup():
    """Evolving 2 steps of dt equals 1 step of 2dt for the same modes —
    guards the per-step scan decay accumulation."""
    s = 16
    xx, yy = H.make_grid(s)
    s_mat, lam2d = dirichlet_sine_basis(s - 2)
    key = jax.random.PRNGKey(1)
    alpha = jnp.asarray([0.7])
    zero = jnp.zeros(1)
    dt2 = jnp.asarray([0.05, 0.05])
    dt1 = jnp.asarray([0.1])
    u2 = H.heat_timeseries_linear_bc(key, alpha, zero, zero, zero, dt2, s, 2,
                                     s_mat, lam2d, xx, yy)
    u1 = H.heat_timeseries_linear_bc(key, alpha, zero, zero, zero, dt1, s, 1,
                                     s_mat, lam2d, xx, yy)
    np.testing.assert_allclose(np.asarray(u2[..., -1]),
                               np.asarray(u1[..., -1]), atol=1e-6)


def test_no_cond_variant():
    key = jax.random.PRNGKey(2)
    u, a, t_steps = H.generate_heat_no_cond(key, n=4, t_final=0.005, s=32)
    assert u.shape == (4, 1, 32, 32, 2)
    np.testing.assert_allclose(t_steps, [0.0, 0.005])
    assert np.isfinite(u).all()


def test_blob_count_respected():
    key = jax.random.PRNGKey(3)
    xx, yy = H.make_grid(16)
    blobs = H.random_gaussian_blobs(key, 32, xx, yy, n_blobs=(1, 1),
                                    amp_range=(1.0, 1.0))
    # with a single positive-or-negative blob, max |u| should be ~amp
    m = np.abs(np.asarray(blobs)).max(axis=(1, 2))
    assert (m > 0.3).all() and (m < 1.5).all()
