"""Unit tests for core differential operators (SURVEY.md section 4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpde_tpu.ops import dirichlet_sine_basis, dst2, idst2, laplacian


class TestLaplacian:
    def test_matches_manual_stencil(self):
        rng = np.random.default_rng(0)
        u = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
        dx = 0.1
        got = np.asarray(laplacian(jnp.asarray(u), dx))
        up = np.pad(u, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="reflect")
        want = (up[:, :, 2:, 1:-1] + up[:, :, :-2, 1:-1]
                + up[:, :, 1:-1, 2:] + up[:, :, 1:-1, :-2]
                - 4 * up[:, :, 1:-1, 1:-1]) / dx**2
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_matches_torch_reference_semantics(self):
        """Golden parity with the reference conv2d implementation
        (reference sample.py:106-134) re-expressed in torch."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        u = rng.standard_normal((4, 2, 12, 12)).astype(np.float32)
        dx = 0.25
        kern = torch.tensor([[0., 1., 0.], [1., -4., 1.], [0., 1., 0.]])
        tu = torch.nn.functional.pad(torch.tensor(u), (1, 1, 1, 1),
                                     mode="reflect")
        want = torch.nn.functional.conv2d(
            tu, kern.view(1, 1, 3, 3).repeat(2, 1, 1, 1), groups=2
        ).numpy() / dx**2
        got = np.asarray(laplacian(jnp.asarray(u), dx))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_channels_last(self):
        rng = np.random.default_rng(2)
        u = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
        a = np.asarray(laplacian(jnp.asarray(u), 1.0, channels_last=True))
        b = np.asarray(laplacian(jnp.asarray(u).transpose(0, 3, 1, 2), 1.0))
        np.testing.assert_allclose(a.transpose(0, 3, 1, 2), b, atol=1e-5)

    def test_quadratic_exact(self):
        # lap(x^2 + y^2) = 4 in the interior
        n = 32
        x = np.arange(n, dtype=np.float64)
        xx, yy = np.meshgrid(x, x, indexing="ij")
        u = (xx**2 + yy**2).astype(np.float32)[None, None]
        lap = np.asarray(laplacian(jnp.asarray(u), 1.0))[0, 0]
        np.testing.assert_allclose(lap[2:-2, 2:-2], 4.0, atol=1e-3)


class TestDST:
    def test_orthonormal_involution(self):
        s, _ = dirichlet_sine_basis(62)
        eye = np.asarray(dst2(jnp.eye(62), s))
        np.testing.assert_allclose(eye, np.eye(62), atol=5e-6)

    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        u = rng.standard_normal((5, 30, 30)).astype(np.float32)
        s, _ = dirichlet_sine_basis(30)
        back = np.asarray(idst2(dst2(jnp.asarray(u), s), s))
        np.testing.assert_allclose(back, u, atol=1e-5)

    def test_eigenvalues_match_modes(self):
        # lam2d must equal the continuous eigenvalue (pi n / L)^2 sums
        _, lam = dirichlet_sine_basis(10, lx=2.0, ly=0.5)
        lam = np.asarray(lam)
        want = ((np.pi * np.arange(1, 11) / 0.5) ** 2)[:, None] + (
            (np.pi * np.arange(1, 11) / 2.0) ** 2)[None, :]
        np.testing.assert_allclose(lam, want, rtol=1e-6)


class TestDeriv:
    """jvp vs central-difference parity (reference notebooks/00_testing.ipynb
    cells 19-20: X atol 1e-5, dX/dt atol 1e-3)."""

    def test_jvp_fd_equivalence(self):
        from dpde_tpu.ops import net_and_dnet_dt, net_and_dnet_dt_fd

        w = jax.random.normal(jax.random.PRNGKey(0), (4, 4))

        def net(x, sigma, labels):
            t = labels[:, 0][:, None, None, None]
            return jnp.sin(t) * (x @ w) + t**2 * x + sigma[:, None, None, None]

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 4))
        sigma = jnp.asarray([0.5, 1.5])
        labels = jnp.asarray([[0.3, 1.0], [0.7, 2.0]])

        # eps=1e-3: large enough that fp32 round-off (~1e-7 * |u| / eps)
        # stays below the 1e-3 parity tolerance, small enough that the
        # O(eps^2) truncation error does too.
        x1, d1 = net_and_dnet_dt(net, x, sigma, labels)
        x2, d2 = net_and_dnet_dt_fd(net, x, sigma, labels, eps=1e-3)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-3)

    def test_dummy_zero(self):
        from dpde_tpu.ops import net_and_dnet_dt_dummy

        net = lambda x, s, l: 2 * x
        x = jnp.ones((2, 1, 4, 4))
        out, d = net_and_dnet_dt_dummy(net, x, jnp.ones(2), None)
        assert np.all(np.asarray(d) == 0)
        np.testing.assert_allclose(np.asarray(out), 2.0)


class TestPallasGroupNormSiLU:
    """Fused GroupNorm+SiLU kernel (ops/pallas/groupnorm.py, round 5)."""

    def _ref(self, x, scale, bias, groups):
        import flax.linen as nn
        import jax.numpy as jnp

        gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
        y = gn.apply({"params": {"scale": scale, "bias": bias}},
                     jnp.asarray(x))
        return np.asarray(nn.silu(y))

    def test_matches_flax_groupnorm_silu(self):
        from dpde_tpu.ops.pallas.groupnorm import groupnorm_silu

        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, 8, 8, 64)).astype(np.float32)
        scale = rng.standard_normal(64).astype(np.float32) * 0.1 + 1.0
        bias = rng.standard_normal(64).astype(np.float32) * 0.1
        got = np.asarray(groupnorm_silu(jnp.asarray(x), jnp.asarray(scale),
                                        jnp.asarray(bias), 32))
        want = self._ref(x, scale, bias, 32)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_jvp_and_grad(self):
        """Forward-mode (the sampler's time tangent) AND reverse-mode
        (guidance backward) must both work and agree with the jnp
        reference implementation."""
        from dpde_tpu.ops.pallas.groupnorm import (
            _gn_silu_xla,
            groupnorm_silu,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(
            np.float32))
        s = jnp.asarray(np.abs(rng.standard_normal(32)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.1)
        dx = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

        f = lambda xx: groupnorm_silu(xx, s, b, 32).sum()
        f_ref = lambda xx: _gn_silu_xla(xx, s, b, 32, 1e-5).sum()
        _, jv = jax.jvp(f, (x,), (dx,))
        _, jv_ref = jax.jvp(f_ref, (x,), (dx,))
        np.testing.assert_allclose(float(jv), float(jv_ref), rtol=1e-4)

        g = jax.grad(f)(x)
        g_ref = jax.grad(f_ref)(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)

    def test_unet_pallas_gn_param_compat(self):
        """pallas_gn=True must produce the SAME param pytree as the XLA
        path (checkpoints interchangeable) and a close forward."""
        from dpde_tpu.models.unet import EDMUNet

        kw = dict(img_channels=2, label_dim=2, base_channels=32,
                  channel_mults=(1, 2), num_res_blocks=1)
        m0 = EDMUNet(**kw)
        m1 = EDMUNet(**kw, pallas_gn=True)
        args = (jnp.zeros((2, 16, 16, 2)), jnp.ones(2),
                jnp.zeros((2, 2)), None)
        p0 = m0.init(jax.random.PRNGKey(0), *args)
        p1 = m1.init(jax.random.PRNGKey(0), *args)
        assert jax.tree.structure(p0) == jax.tree.structure(p1)
        x = jnp.asarray(np.random.default_rng(2).standard_normal(
            (2, 16, 16, 2)).astype(np.float32))
        y0 = m0.apply(p0, x, jnp.ones(2), jnp.zeros((2, 2)), None)
        y1 = m1.apply(p0, x, jnp.ones(2), jnp.zeros((2, 2)), None)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                                   rtol=1e-4, atol=1e-4)
