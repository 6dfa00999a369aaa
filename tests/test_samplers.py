"""Sampler unit tests (shapes, determinism, guidance variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpde_tpu.models import Denoiser, EDMUNet
from dpde_tpu.sampling import (
    ForwardConditionedSampler,
    JointSampler,
    UnconditionalSampler,
    net_and_dnet_dt_dummy,
    pde_losses,
)


@pytest.fixture(scope="module")
def tiny_joint_net():
    net = EDMUNet(img_channels=2, label_dim=2, base_channels=32,
                  channel_mults=(1, 2), num_res_blocks=1)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 2)),
                      jnp.ones(1), jnp.zeros((1, 2)), None)
    apply_fn = lambda p, xx, ss, ll, oo, train=False, rngs=None: \
        net.apply(p, xx, ss, ll, oo, train=train)
    return Denoiser(apply_fn, params)


@pytest.fixture(scope="module")
def tiny_forward_net():
    net = EDMUNet(img_channels=1, obs_channels=1, label_dim=2,
                  base_channels=32, channel_mults=(1, 2), num_res_blocks=1)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 1)),
                      jnp.ones(1), jnp.zeros((1, 2)),
                      jnp.zeros((1, 16, 16, 1)))
    apply_fn = lambda p, xx, ss, ll, oo, train=False, rngs=None: \
        net.apply(p, xx, ss, ll, oo, train=train)
    return Denoiser(apply_fn, params)


class TestUnconditional:
    def test_deterministic_given_key(self, tiny_joint_net):
        s = UnconditionalSampler(tiny_joint_net, (16, 16), 2, 3, num_steps=6)
        lbl = jnp.zeros((3, 2))
        a = np.asarray(s.sample(jax.random.PRNGKey(7), labels=lbl))
        b = np.asarray(s.sample(jax.random.PRNGKey(7), labels=lbl))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(s.sample(jax.random.PRNGKey(8), labels=lbl))
        assert not np.allclose(a, c)

    def test_batch_from_num_samples_without_labels(self, tiny_joint_net):
        s = UnconditionalSampler(tiny_joint_net, (16, 16), 2, 5, num_steps=4)
        out = s.sample(jax.random.PRNGKey(0))
        assert out.shape == (5, 16, 16, 2)


class TestJoint:
    def test_zero_masks_no_nan(self, tiny_joint_net):
        """All-zero masks exercise the sqrt(0) guard (the reference skips
        the term with an if; we must not produce NaN grads)."""
        s = JointSampler(tiny_joint_net, (16, 16), 2, 2, ch_a=1,
                         loss_fn=pde_losses.heat_loss2,
                         loss_kwargs={"dx": 1 / 15}, num_steps=6)
        zeros = np.zeros((16, 16), bool)
        x, losses = s.sample(jax.random.PRNGKey(0), jnp.ones((2, 2)),
                             np.zeros((1, 16, 16, 1), np.float32),
                             np.zeros((1, 16, 16, 1), np.float32),
                             zeros, zeros, 1.0, 1.0, 1.0,
                             return_losses=True)
        assert np.isfinite(np.asarray(x)).all()
        np.testing.assert_allclose(losses[:, 0], 0.0)
        np.testing.assert_allclose(losses[:, 1], 0.0)

    def test_losses_trace_shape(self, tiny_joint_net):
        s = JointSampler(tiny_joint_net, (16, 16), 2, 2, ch_a=1,
                         loss_fn=pde_losses.heat_loss2,
                         loss_kwargs={"dx": 1 / 15}, num_steps=9)
        m = np.ones((16, 16), bool)
        _, losses = s.sample(jax.random.PRNGKey(0), jnp.ones((2, 2)),
                             np.zeros((1, 16, 16, 1), np.float32),
                             np.zeros((1, 16, 16, 1), np.float32),
                             m, m, 1.0, 1.0, 1.0, return_losses=True)
        assert losses.shape == (9, 4)

    @pytest.mark.parametrize("mode", ["second_eval", "x0", "x0c",
                                      "hybrid"])
    def test_guidance_modes_run_and_guide(self, tiny_joint_net, mode):
        """The cheap guidance modes (round-5 serving path) must (a) run
        NaN-free, (b) actually steer samples toward the observations
        relative to the unguided run, (c) reduce to the exact mode's
        trajectory when zetas are zero."""
        m = np.ones((16, 16), bool)
        lbl = jnp.ones((2, 2))
        obs = np.full((1, 16, 16, 1), 0.7, np.float32)
        mk = lambda gm: JointSampler(
            tiny_joint_net, (16, 16), 2, 2, ch_a=1,
            loss_fn=pde_losses.heat_loss2, loss_kwargs={"dx": 1 / 15},
            num_steps=8, guidance_mode=gm)
        sf = mk(mode)
        xg, losses = sf.sample(jax.random.PRNGKey(0), lbl, obs, obs, m, m,
                               2.0, 2.0, 0.0, return_losses=True)
        assert np.isfinite(np.asarray(xg)).all()
        assert losses.shape == (8, 4)
        x0, _ = sf.sample(jax.random.PRNGKey(0), lbl, obs, obs, m, m,
                          0.0, 0.0, 0.0)
        err_g = np.abs(np.asarray(xg)[..., 0] - 0.7).mean()
        err_0 = np.abs(np.asarray(x0)[..., 0] - 0.7).mean()
        assert err_g < err_0
        # zero-zeta trajectories agree across modes (same Heun math)
        xe, _ = mk("exact").sample(jax.random.PRNGKey(0), lbl, obs, obs,
                                   m, m, 0.0, 0.0, 0.0)
        np.testing.assert_allclose(np.asarray(x0), np.asarray(xe),
                                   rtol=1e-4, atol=1e-5)

    def test_guidance_mode_validation(self, tiny_joint_net):
        with pytest.raises(ValueError, match="guidance_mode"):
            JointSampler(tiny_joint_net, (16, 16), 2, 2, ch_a=1,
                         loss_fn=pde_losses.heat_loss2,
                         loss_kwargs={"dx": 1 / 15},
                         guidance_mode="bogus")

    def test_zero_zetas_equals_unconditional_path(self, tiny_joint_net):
        """With all-zero guidance weights the guided sampler must reduce to
        the plain Heun sampler (same key, same schedule)."""
        m = np.zeros((16, 16), bool)
        lbl = jnp.ones((3, 2))
        js = JointSampler(tiny_joint_net, (16, 16), 2, 3, ch_a=1,
                          loss_fn=pde_losses.heat_loss2,
                          loss_kwargs={"dx": 1 / 15}, num_steps=8)
        us = UnconditionalSampler(tiny_joint_net, (16, 16), 2, 3,
                                  num_steps=8)
        xg, _ = js.sample(jax.random.PRNGKey(3), lbl,
                          np.zeros((1, 16, 16, 1), np.float32),
                          np.zeros((1, 16, 16, 1), np.float32),
                          m, m, 0.0, 0.0, 0.0)
        xu = us.sample(jax.random.PRNGKey(3), labels=lbl)
        np.testing.assert_allclose(np.asarray(xg), np.asarray(xu),
                                   rtol=1e-4, atol=1e-5)

    def test_llg_dispatch_dummy_derivative(self, tiny_joint_net):
        """llg-style: X_and_dXdt_dummy + norm-constraint loss
        (reference test2.py:90-95)."""
        net = EDMUNet(img_channels=6, label_dim=3, base_channels=32,
                      channel_mults=(1, 2), num_res_blocks=1)
        params = net.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 6)),
                          jnp.ones(1), jnp.zeros((1, 3)), None)
        apply_fn = lambda p, xx, ss, ll, oo, train=False, rngs=None: \
            net.apply(p, xx, ss, ll, oo, train=train)
        den = Denoiser(apply_fn, params)
        s = JointSampler(den, (16, 16), 6, 2, ch_a=3,
                         loss_fn=pde_losses.llg_loss2, loss_kwargs={},
                         num_steps=5,
                         out_and_grad_fn=net_and_dnet_dt_dummy)
        m = np.ones((16, 16), bool)
        x, losses = s.sample(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                             np.zeros((1, 16, 16, 3), np.float32),
                             np.zeros((1, 16, 16, 3), np.float32),
                             m, m, 1.0, 0.5, 1.0, return_losses=True)
        assert x.shape == (2, 16, 16, 6)
        assert np.isfinite(np.asarray(x)).all()


class TestForwardConditioned:
    def test_runs_with_net_obs(self, tiny_forward_net):
        s = ForwardConditionedSampler(
            tiny_forward_net, (16, 16), 1, 2,
            loss_fn=pde_losses.heat_loss2, loss_kwargs={"dx": 1 / 15},
            num_steps=6)
        m = np.ones((16, 16), bool)
        obs = jnp.ones((2, 16, 16, 1)) * 0.3
        x, losses = s.sample(jax.random.PRNGKey(0), jnp.ones((2, 2)),
                             np.zeros((2, 16, 16, 1), np.float32), m,
                             zeta_u=1.0, zeta_pde=1.0, net_obs=obs,
                             return_losses=True)
        assert x.shape == (2, 16, 16, 1)
        assert losses.shape == (6, 3)
        assert np.isfinite(np.asarray(x)).all()

    def test_obs_conditioning_affects_samples(self, tiny_forward_net):
        # perturb params away from the zero-init output head — at init the
        # final conv is zero so obs cannot influence the output
        net = tiny_forward_net.replace_params(
            jax.tree_util.tree_map(lambda p: p + 0.01, tiny_forward_net.params))
        s = ForwardConditionedSampler(
            net, (16, 16), 1, 2,
            loss_fn=pde_losses.heat_loss2, loss_kwargs={"dx": 1 / 15},
            num_steps=4)
        m = np.zeros((16, 16), bool)
        ou = np.zeros((2, 16, 16, 1), np.float32)
        x1, _ = s.sample(jax.random.PRNGKey(1), jnp.ones((2, 2)), ou, m,
                         0.0, 0.0, net_obs=jnp.zeros((2, 16, 16, 1)))
        x2, _ = s.sample(jax.random.PRNGKey(1), jnp.ones((2, 2)), ou, m,
                         0.0, 0.0, net_obs=jnp.ones((2, 16, 16, 1)))
        assert not np.allclose(np.asarray(x1), np.asarray(x2))


class TestItemBatching:
    def test_item_batching_exact(self, tiny_joint_net):
        """An item inside a K-item flattened batch must produce exactly the
        samples and loss trace of a standalone run (VERDICT round-1 bug:
        a single global sqrt coupled the items' guidance gradients;
        reference semantics are per-item sqrt, sample.py:337-355)."""
        s_per = 2          # samples per item
        k = 3              # items
        rng = np.random.default_rng(0)
        h = w = 16
        steps = 6
        mask = np.zeros((h, w), bool)
        mask[2:-2, 2:-2] = rng.random((h - 4, w - 4)) < 0.4

        obs_a = rng.standard_normal((k, 1, h, w, 1)).astype(np.float32)
        obs_u = rng.standard_normal((k, 1, h, w, 1)).astype(np.float32)
        labels = rng.uniform(0.2, 1.0, (k, 1, 2)).astype(np.float32)
        latents = rng.standard_normal((k, s_per, h, w, 2)).astype(np.float32)

        rep = lambda x: np.repeat(x, s_per, axis=1)

        sampler = JointSampler(tiny_joint_net, (h, w), 2, s_per, ch_a=1,
                               loss_fn=pde_losses.heat_loss2,
                               loss_kwargs={"dx": 1 / (w - 1)},
                               num_steps=steps)
        # batched run: K items flattened
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        xb, lb = sampler.sample(
            jax.random.PRNGKey(0), jnp.asarray(flat(rep(labels))),
            flat(rep(obs_a)), flat(rep(obs_u)), mask, mask,
            2.0, 0.7, 1.5, return_losses=True,
            latents=jnp.asarray(flat(latents)))
        xb = np.asarray(xb).reshape(k, s_per, h, w, 2)
        assert lb.shape == (steps, k, 4)

        # standalone runs, same latents
        for i in range(k):
            xi, li = sampler.sample(
                jax.random.PRNGKey(0), jnp.asarray(rep(labels)[i]),
                rep(obs_a)[i], rep(obs_u)[i], mask, mask,
                2.0, 0.7, 1.5, return_losses=True,
                latents=jnp.asarray(latents[i]))
            np.testing.assert_allclose(np.asarray(xi), xb[i],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(li, lb[:, i], rtol=1e-4, atol=1e-6)

    def test_coupling_absent(self, tiny_joint_net):
        """Changing item 2's observations must not change item 1's output
        at all (per-item gradient independence)."""
        s_per, h, w = 2, 16, 16
        rng = np.random.default_rng(1)
        mask = np.ones((h, w), bool)
        lbl = jnp.asarray(rng.uniform(0.2, 1.0, (4, 2)).astype(np.float32))
        latents = jnp.asarray(
            rng.standard_normal((4, h, w, 2)).astype(np.float32))
        obs_a = rng.standard_normal((4, h, w, 1)).astype(np.float32)
        obs_u = rng.standard_normal((4, h, w, 1)).astype(np.float32)
        sampler = JointSampler(tiny_joint_net, (h, w), 2, s_per, ch_a=1,
                               loss_fn=pde_losses.heat_loss2,
                               loss_kwargs={"dx": 1 / (w - 1)},
                               num_steps=5)
        x1, _ = sampler.sample(jax.random.PRNGKey(0), lbl, obs_a, obs_u,
                               mask, mask, 2.0, 0.7, 1.5, latents=latents)
        obs_a2 = obs_a.copy()
        obs_a2[s_per:] *= 10.0        # perturb item 2 only
        x2, _ = sampler.sample(jax.random.PRNGKey(0), lbl, obs_a, obs_u.copy(),
                               mask, mask, 2.0, 0.7, 1.5, latents=latents)
        x3, _ = sampler.sample(jax.random.PRNGKey(0), lbl, obs_a2, obs_u,
                               mask, mask, 2.0, 0.7, 1.5, latents=latents)
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        np.testing.assert_array_equal(np.asarray(x1)[:s_per],
                                      np.asarray(x3)[:s_per])
        assert not np.allclose(np.asarray(x1)[s_per:],
                               np.asarray(x3)[s_per:])
