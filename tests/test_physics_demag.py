"""Demag tensor golden tests (port of the reference's Option-1 numerical
verification structure, tests/test_llg_pde_loss.py:56-170, with MagTense
replaced by analytic identities)."""

import jax.numpy as jnp
import numpy as np

from dpde_tpu.physics.demag import (
    DemagKernel,
    h_demag,
    newell_tensor_2d,
)


def test_cube_self_term_third():
    tab = newell_tensor_2d(1, 1, 1e-9, 1e-9, 1e-9, use_native=False)
    np.testing.assert_allclose(tab[0, 0, :3], 1.0 / 3.0, rtol=1e-10)
    np.testing.assert_allclose(tab[0, 0, 3:], 0.0, atol=1e-12)


def test_trace_identity():
    """sum_k N_kk = 1 at r=0 and 0 elsewhere (Poisson eq for the prism)."""
    tab = newell_tensor_2d(4, 3, 2e-9, 1e-9, 3e-9, use_native=False)
    tr = tab[..., :3].sum(-1)
    np.testing.assert_allclose(tr[0, 0], 1.0, rtol=1e-10)
    off = np.delete(tr.reshape(-1), 0)
    np.testing.assert_allclose(off, 0.0, atol=1e-10)


def test_thin_film_limits():
    """Uniform out-of-plane film: H_z -> -Ms in the interior; uniform
    in-plane: H -> 0 (standard demag-factor limits)."""
    nx = ny = 32
    k = DemagKernel.build(nx, ny, 5e-9, 5e-9, 5e-10, use_native=False,
                          method="matmul")
    ms = 8e5
    m_z = jnp.zeros((nx, ny, 3)).at[..., 2].set(1.0)
    hz = np.asarray(h_demag(m_z, k, ms))[nx // 2, ny // 2, 2]
    assert abs(hz / ms + 1.0) < 0.01
    m_x = jnp.zeros((nx, ny, 3)).at[..., 0].set(1.0)
    hx = np.asarray(h_demag(m_x, k, ms))[nx // 2, ny // 2, 0]
    assert abs(hx / ms) < 0.01


def test_matmul_fft_paths_agree():
    nx, ny = 16, 8
    km = DemagKernel.build(nx, ny, 7.8125e-9, 7.8125e-9, 3e-9,
                           use_native=False, method="matmul")
    kf = DemagKernel.build(nx, ny, 7.8125e-9, 7.8125e-9, 3e-9,
                           use_native=False, method="fft")
    rng = np.random.default_rng(0)
    m = rng.standard_normal((2, nx, ny, 3)).astype(np.float32)
    m /= np.linalg.norm(m, axis=-1, keepdims=True)
    hm = np.asarray(h_demag(jnp.asarray(m), km, 8e5))
    hf = np.asarray(h_demag(jnp.asarray(m), kf, 8e5))
    np.testing.assert_allclose(hm, hf, rtol=1e-3, atol=30.0)  # |H| ~ 1e5


def test_self_adjointness():
    """The demag operator is self-adjoint: <m1, N m2> = <m2, N m1>."""
    nx, ny = 12, 6
    k = DemagKernel.build(nx, ny, 2e-9, 2e-9, 1e-9, use_native=False,
                          method="matmul")
    rng = np.random.default_rng(1)
    m1 = rng.standard_normal((nx, ny, 3)).astype(np.float32)
    m2 = rng.standard_normal((nx, ny, 3)).astype(np.float32)
    h1 = np.asarray(h_demag(jnp.asarray(m1), k, 1.0), dtype=np.float64)
    h2 = np.asarray(h_demag(jnp.asarray(m2), k, 1.0), dtype=np.float64)
    e12 = float((m1.astype(np.float64) * h2).sum())
    e21 = float((m2.astype(np.float64) * h1).sum())
    scale = max(abs(e12), np.abs(m1 * h2).sum())
    assert abs(e12 - e21) / scale < 1e-4


def test_native_numpy_agree_if_built():
    from dpde_tpu.native import newell_native

    nat = newell_native.newell_tensor_2d(4, 4, 2e-9, 2e-9, 1e-9)
    if nat is None:
        import pytest

        pytest.skip("native newell library not built")
    ref = newell_tensor_2d(4, 4, 2e-9, 2e-9, 1e-9, use_native=False)
    np.testing.assert_allclose(nat, ref, rtol=1e-10, atol=1e-14)
