"""LLG solver verification (port of the reference's two-way residual check
structure, tests/test_llg_pde_loss.py:56-310, with MagTense replaced by the
in-repo integrator as ground truth).

Small 16x4 grids keep these CPU-fast; the full 64x16 std-4 behavior is
exercised by the datagen entry point and benchmarks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpde_tpu.physics import llg as L
from dpde_tpu.physics.demag import DemagKernel

RES = (16, 4, 1)
GRID = (500e-9 * 16 / 64, 125e-9 * 4 / 16, 3e-9)  # same cell size as std-4


@pytest.fixture(scope="module")
def setup():
    nx, ny, _ = RES
    dx = GRID[0] / nx
    params = L.LLGParams(dx=dx)
    kernel = DemagKernel.build(nx, ny, dx, GRID[1] / ny, GRID[2],
                               use_native=False, method="matmul")
    rng = np.random.default_rng(0)
    m0 = rng.standard_normal((nx, ny, 3)).astype(np.float32)
    m0 /= np.linalg.norm(m0, axis=-1, keepdims=True)
    return params, kernel, jnp.asarray(m0)


def test_norm_preserved(setup):
    params, kernel, m0 = setup
    h = jnp.asarray([10.0, 5.0, 0.0]) / (1000 * L.MU0)
    traj = L.integrate(m0, h, 4e-12, 10, 8, kernel, params)
    norms = np.linalg.norm(np.asarray(traj), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_residual_matches_rhs(setup):
    """Option-1 structure (reference test lines 80-117): the finite
    difference (m(t+dt) - m(t)) must match llg_rhs(m, H_eff) * dt built from
    independently composed exchange + demag + external fields."""
    params, kernel, m0 = setup
    h_ext_mT = np.array([7.0, -3.0, 0.0])
    h_ext = jnp.asarray(h_ext_mT, dtype=jnp.float32) / (1000 * L.MU0)

    # relax briefly so the state is smooth, then take a tiny step
    m = L.integrate(m0, h_ext, 4e-12, 5, 16, kernel, params)[-1]
    dt = 1e-14
    m_next = L.integrate(m, h_ext, dt, 1, 1, kernel, params)[-1]
    dmdt_fd = (np.asarray(m_next) - np.asarray(m)) / dt

    h_eff = L.h_effective(m, h_ext, kernel, params)
    rhs = np.asarray(L.llg_rhs(m, h_eff, params))
    err = np.linalg.norm(dmdt_fd - rhs, axis=-1) / (
        np.linalg.norm(rhs, axis=-1).max() + 1e-30)
    assert err.max() < 5e-3


def test_energy_dissipation(setup):
    """Without external field the LLG damping monotonically decreases the
    micromagnetic energy -0.5 mu0 Ms m.(H_demag) - (terms); we check the
    weaker property that m.H_eff (alignment) increases over a relax run."""
    params, kernel, m0 = setup

    def mean_align(m):
        h = L.h_effective(m, jnp.zeros(3), kernel, params)
        return float(jnp.mean(jnp.sum(m * h, axis=-1)))

    dt = L.stable_dt(params)
    m1 = L.relax(m0, lambda t: jnp.zeros(3), dt, 200, kernel, params)
    m2 = L.relax(m1, lambda t: jnp.zeros(3), dt, 400, kernel, params)
    a0, a1, a2 = mean_align(m0), mean_align(m1), mean_align(m2)
    assert a1 > a0
    assert a2 >= a1 - abs(a1) * 1e-3


def test_exchange_field_uniform_zero(setup):
    params, kernel, _ = setup
    m = jnp.zeros((RES[0], RES[1], 3)).at[..., 0].set(1.0)
    h = np.asarray(L.h_exchange(m, params))
    np.testing.assert_allclose(h, 0.0, atol=1e-6)


def test_integrate_output_layout(setup):
    params, kernel, m0 = setup
    fields = L.sample_external_fields(3, seed=1)
    traj = L.gen_sequences(np.asarray(m0), fields, res=RES, grid=GRID,
                           t_steps=4, t_per_step=4e-12, substeps=4,
                           params=params, kernel=kernel)
    assert traj.shape == (3, 4, RES[0], RES[1], 3)
    # first snapshot is the initial state (reference stores seq[:t_steps])
    want = np.broadcast_to(np.asarray(m0)[None], traj[:, 0].shape)
    np.testing.assert_allclose(traj[:, 0], want, atol=1e-6)


def test_sample_external_fields_ranges():
    h = L.sample_external_fields(100, seed=2, h_norm=(0, 50))
    norms = np.linalg.norm(h[:, :2], axis=1)
    assert (norms <= 50.0 + 1e-6).all()
    assert np.all(h[:, 2] == 0)


def test_substep_convergence(setup):
    """Halving the substep changes the trajectory by O(dt^4) — RK4 order."""
    params, kernel, m0 = setup
    h = jnp.asarray([20.0, 0.0, 0.0]) / (1000 * L.MU0)
    t1 = L.integrate(m0, h, 4e-12, 4, 8, kernel, params)[-1]
    t2 = L.integrate(m0, h, 4e-12, 4, 16, kernel, params)[-1]
    diff = np.abs(np.asarray(t1) - np.asarray(t2)).max()
    assert diff < 1e-4  # fp32 accumulation noise floor
