"""Model + preconditioner + EMA + loss unit tests (SURVEY.md section 4
items 3-4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpde_tpu.models import (
    Denoiser,
    EDMHeatLoss,
    EDMLoss,
    EDMUNet,
    EMAConfig,
    PositionalEmbedding,
    SmallUnet,
    ema_decay,
    ema_update,
)


@pytest.fixture(scope="module")
def joint_net():
    net = EDMUNet(img_channels=2, label_dim=2, base_channels=32,
                  channel_mults=(1, 2), num_res_blocks=1)
    x = jnp.zeros((1, 16, 16, 2))
    params = net.init(jax.random.PRNGKey(0), x, jnp.ones((1,)),
                      jnp.zeros((1, 2)), None)

    def apply_fn(p, xx, ss, ll, oo, train=False, rngs=None):
        return net.apply(p, xx, ss, ll, oo, train=train)

    return net, params, Denoiser(apply_fn, params)


class TestEDMUNet:
    def test_shapes_and_zero_init(self, joint_net):
        net, params, _ = joint_net
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 16, 2))
        out = net.apply(params, x, jnp.ones(3), jnp.zeros((3, 2)), None)
        assert out.shape == (3, 16, 16, 2)
        # final conv zero-init (nets.py:298-301): raw net output is 0 at init
        assert float(jnp.abs(out).max()) == 0.0

    def test_reference_capacity(self):
        """unet-v2 at reference hyperparams stays under 10M params
        (nets.py:217-222 'scaled down to be < 10M')."""
        net = EDMUNet(img_channels=2, label_dim=2)
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 2)),
                          jnp.ones((1,)), jnp.zeros((1, 2)), None)
        n = sum(p.size for p in jax.tree_util.tree_leaves(params))
        assert 5e6 < n < 10e6

    def test_obs_conditioning_changes_output(self):
        net = EDMUNet(img_channels=1, obs_channels=1, label_dim=0,
                      base_channels=32, channel_mults=(1, 2),
                      num_res_blocks=1)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1))
        obs1 = jnp.zeros((2, 16, 16, 1))
        obs2 = jnp.ones((2, 16, 16, 1))
        params = net.init(jax.random.PRNGKey(3), x, jnp.ones(2), None, obs1)
        # perturb away from the zero-init output head so obs has effect
        params = jax.tree_util.tree_map(
            lambda p: p + 0.01 * jnp.ones_like(p), params)
        o1 = net.apply(params, x, jnp.ones(2), None, obs1)
        o2 = net.apply(params, x, jnp.ones(2), None, obs2)
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_rectangular_grid(self):
        net = EDMUNet(img_channels=6, label_dim=4, base_channels=32,
                      channel_mults=(1, 2), num_res_blocks=1)
        x = jnp.zeros((2, 64, 16, 6))
        params = net.init(jax.random.PRNGKey(0), x, jnp.ones(2),
                          jnp.zeros((2, 4)), None)
        out = net.apply(params, x, jnp.ones(2), jnp.zeros((2, 4)), None)
        assert out.shape == (2, 64, 16, 6)


class TestPrecondition:
    def test_edm_weights(self, joint_net):
        """At init F=0, so D(x) = c_skip x exactly (nets.py:352-366)."""
        _, _, den = joint_net
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 2))
        sigma = jnp.asarray([0.5, 2.0])
        d = den(x, sigma, jnp.zeros((2, 2)))
        c_skip = (0.25 / (sigma ** 2 + 0.25)).reshape(-1, 1, 1, 1)
        np.testing.assert_allclose(np.asarray(d), np.asarray(c_skip * x),
                                   rtol=1e-5, atol=1e-6)

    def test_denoiser_is_pytree(self, joint_net):
        _, _, den = joint_net
        leaves = jax.tree_util.tree_leaves(den)
        assert len(leaves) > 0
        den2 = jax.tree_util.tree_map(lambda x: x, den)
        assert isinstance(den2, Denoiser)


class TestPositionalEmbedding:
    def test_matches_reference_formula(self):
        emb = PositionalEmbedding(num_channels=8)
        out = emb.apply({}, jnp.asarray([2.0]))
        freqs = (1 / 10000) ** (np.arange(4) / 4)
        want = np.concatenate([np.cos(2 * freqs), np.sin(2 * freqs)])
        np.testing.assert_allclose(np.asarray(out)[0], want, rtol=1e-6)


class TestEMA:
    def test_warmup_schedule(self):
        """d_eff = 1 - min(1, n/warmup)(1 - d) (nets.py:395-400)."""
        cfg = EMAConfig(decay=0.999, warmup_steps=20)
        d5 = float(ema_decay(cfg, jnp.asarray(5)))
        np.testing.assert_allclose(d5, 1 - 0.25 * 0.001, rtol=1e-6)
        d40 = float(ema_decay(cfg, jnp.asarray(40)))
        np.testing.assert_allclose(d40, 0.999, rtol=1e-6)

    def test_update_moves_toward_params(self):
        cfg = EMAConfig(decay=0.9, warmup_steps=0)
        ema = {"w": jnp.zeros(3)}
        p = {"w": jnp.ones(3)}
        out = ema_update(cfg, ema, p, jnp.asarray(1))
        np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)

    def test_update_every_gate(self):
        cfg = EMAConfig(decay=0.5, warmup_steps=0, update_every=2)
        ema = {"w": jnp.zeros(3)}
        p = {"w": jnp.ones(3)}
        skip = ema_update(cfg, ema, p, jnp.asarray(1))   # 1 % 2 != 0
        np.testing.assert_allclose(np.asarray(skip["w"]), 0.0)
        do = ema_update(cfg, ema, p, jnp.asarray(2))
        np.testing.assert_allclose(np.asarray(do["w"]), 0.5)


class TestLosses:
    def test_edm_loss_finite_and_positive(self, joint_net):
        _, _, den = joint_net
        loss_fn = EDMLoss()
        x = jax.random.normal(jax.random.PRNGKey(5), (4, 16, 16, 2))
        ps, aux = loss_fn(den, jax.random.PRNGKey(6), x, jnp.zeros((4, 2)))
        assert ps.shape == (4,)
        assert np.isfinite(np.asarray(ps)).all()
        assert (np.asarray(ps) > 0).all()
        assert "Loss/train/batch/EDM" in aux

    def test_edm_loss_perfect_denoiser_small(self):
        """A perfect denoiser net(x+n)=x gives loss ~ weight * 0."""
        loss_fn = EDMLoss()
        x = jax.random.normal(jax.random.PRNGKey(7), (4, 8, 8, 1))

        class Perfect:
            def __call__(self, xn, sigma, labels, obs=None, train=False,
                         rngs=None):
                return x  # returns the clean signal

        ps, _ = loss_fn(Perfect(), jax.random.PRNGKey(8), x, None)
        np.testing.assert_allclose(np.asarray(ps), 0.0, atol=1e-5)

    @pytest.mark.parametrize("estimation", ["ME", "SE"])
    def test_heat_loss_runs(self, joint_net, estimation):
        _, _, den = joint_net
        loss_fn = EDMHeatLoss(dx=1 / 15, residual_estimation=estimation)
        x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 2))
        labels = jnp.abs(jax.random.normal(jax.random.PRNGKey(10), (2, 2)))
        ps, aux = loss_fn(den, jax.random.PRNGKey(11), x, labels)
        assert ps.shape == (2,)
        assert np.isfinite(np.asarray(ps)).all()
        assert "Loss/train/batch/PDE" in aux

    def test_heat_loss_grad_flows(self, joint_net):
        _, params, den = joint_net
        loss_fn = EDMHeatLoss(dx=1 / 15)
        x = jax.random.normal(jax.random.PRNGKey(12), (2, 16, 16, 2))
        labels = jnp.ones((2, 2))

        def scalar_loss(p):
            ps, _ = loss_fn(den.replace_params(p), jax.random.PRNGKey(13),
                            x, labels)
            return ps.mean()

        g = jax.grad(scalar_loss)(params)
        gnorm = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0
