"""Guidance PDE-loss parity against the reference formulas re-expressed in
torch (reference: src/diffusion_pde/sampling/pde_losses.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dpde_tpu.sampling.pde_losses import heat_loss2, llg_loss2

torch = pytest.importorskip("torch")


def _torch_heat_loss2(u, dudt, labels, dx):
    """Reference heat_loss2 (pde_losses.py:71-96), NCHW torch."""
    alpha = labels[:, -1].view(u.shape[0], 1, 1, 1)
    kern = torch.tensor([[0., 1., 0.], [1., -4., 1.], [0., 1., 0.]])
    up = torch.nn.functional.pad(u, (1, 1, 1, 1), mode="reflect")
    c = u.shape[1]
    lap = torch.nn.functional.conv2d(
        up, kern.view(1, 1, 3, 3).repeat(c, 1, 1, 1), groups=c) / dx ** 2
    return torch.sqrt(torch.sum((dudt - alpha * lap) ** 2)
                      / (u.shape[-1] * u.shape[-2]))


def test_heat_loss2_matches_reference():
    rng = np.random.default_rng(0)
    u = rng.standard_normal((3, 1, 12, 12)).astype(np.float32)
    dudt = rng.standard_normal((3, 1, 12, 12)).astype(np.float32)
    labels = rng.uniform(0.1, 1.0, (3, 2)).astype(np.float32)
    dx = 1 / 11

    want = float(_torch_heat_loss2(torch.tensor(u), torch.tensor(dudt),
                                   torch.tensor(labels), dx))
    got = float(heat_loss2(jnp.asarray(np.moveaxis(u, 1, -1)),
                           jnp.asarray(np.moveaxis(dudt, 1, -1)),
                           jnp.asarray(labels), dx)[0])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_heat_loss2_zero_residual():
    """If dudt == alpha * lap(u), loss must be ~0."""
    from dpde_tpu.ops.stencils import laplacian

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((2, 8, 8, 1)).astype(np.float32))
    labels = jnp.asarray([[0.0, 0.7], [0.0, 0.3]])
    dudt = labels[:, 1].reshape(-1, 1, 1, 1) * laplacian(
        u, 0.5, channels_last=True)
    got = float(heat_loss2(u, dudt, labels, 0.5)[0])
    assert got < 1e-3


def test_heat_loss2_alpha_fallback():
    u = jnp.ones((1, 4, 4, 1))
    dudt = jnp.zeros((1, 4, 4, 1))
    # uniform field -> lap = 0 -> residual = dudt = 0
    assert float(heat_loss2(u, dudt, None, 1.0)[0]) == 0.0


def test_llg_loss2_matches_reference():
    """Reference: sqrt(sum((1-|m|)^2)) / (H*W) (pde_losses.py:99-117)."""
    rng = np.random.default_rng(2)
    m = rng.standard_normal((2, 3, 16, 8)).astype(np.float32)  # NCHW
    tm = torch.tensor(m)
    norm = torch.linalg.norm(tm, dim=1)
    want = float(torch.sqrt(torch.sum((1 - norm) ** 2))
                 / (m.shape[2] * m.shape[3]))
    got = float(llg_loss2(jnp.asarray(np.moveaxis(m, 1, -1)),
                          None, None)[0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_llg_loss2_unit_norm_zero():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((2, 8, 4, 3)).astype(np.float32)
    m /= np.linalg.norm(m, axis=-1, keepdims=True)
    assert float(llg_loss2(jnp.asarray(m), None, None)[0]) < 1e-5


def test_llg_residual_loss_on_solver_trajectory():
    """The full-physics LLG guidance loss must be ~0 for dm/dt computed
    from the solver RHS itself (internal consistency)."""
    from dpde_tpu.physics import llg as L
    from dpde_tpu.physics.demag import DemagKernel
    from dpde_tpu.sampling.pde_losses import llg_residual_loss

    nx, ny = 16, 4
    dx = 7.8125e-9
    params = L.LLGParams(dx=dx)
    kernel = DemagKernel.build(nx, ny, dx, dx, 3e-9, use_native=False)
    rng = np.random.default_rng(4)
    m = rng.standard_normal((2, nx, ny, 3)).astype(np.float32)
    m /= np.linalg.norm(m, axis=-1, keepdims=True)
    m = jnp.asarray(m)
    h_mT = np.asarray([[5.0, -2.0, 0.0], [0.0, 3.0, 0.0]], np.float32)
    labels = jnp.asarray(np.concatenate(
        [np.zeros((2, 1), np.float32), h_mT], axis=1))

    t_per = 4e-12
    h_ext = jnp.asarray(h_mT)[:, None, None, :] / (1000 * L.MU0)
    rhs = L.llg_rhs(m, L.h_effective(m, h_ext, kernel, params), params)
    dmdt = rhs * t_per

    loss = float(llg_residual_loss(m, dmdt, labels, kernel,
                                   params, t_per)[0])
    assert loss < 1e-6

    # and clearly nonzero for a wrong derivative
    loss_bad = float(llg_residual_loss(m, -dmdt, labels, kernel, params,
                                       t_per)[0])
    assert loss_bad > 10 * max(loss, 1e-12)
