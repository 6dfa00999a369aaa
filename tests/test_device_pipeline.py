"""Device-resident data pipeline (data/device_pipeline.py): batch
semantics parity with the host iterators, and the one-dispatch-per-epoch
train path."""

import jax
import jax.numpy as jnp
import numpy as np

from dpde_tpu.data import device_pipeline as dp
from dpde_tpu.models import Denoiser, EDMLoss, EDMUNet
from dpde_tpu.models.ema import EMAConfig
from dpde_tpu.parallel import make_mesh
from dpde_tpu.training import init_train_state, make_optimizer
from dpde_tpu.training.state import make_eval_step, make_train_step


def _toy_device_data(n=6, t=5, h=8, w=8, c=1):
    """u[i, t] = i + t/10 everywhere — values encode (item, time)."""
    u = (np.arange(n)[:, None, None, None, None]
         + np.arange(t)[None, :, None, None, None] / 10.0)
    u = np.broadcast_to(u, (n, t, h, w, c)).astype(np.float32)
    # to_device_data expects the reference layout (N, ch, H, W, T)
    ref = np.moveaxis(u, (4, 1), (1, 4))
    t_steps = np.linspace(0.0, 1.0, t).astype(np.float32)
    labels = np.arange(n, dtype=np.float32)[:, None] * 2.0
    return dp.to_device_data(ref, t_steps, labels), t_steps


class TestBatchFn:
    def test_joint_semantics(self):
        dd, t_steps = _toy_device_data()
        fn = dp.make_batch_fn("joint", start_at_t0=False)
        idxs = jnp.asarray([3, 0, 5, 1])
        x, lab, obs = fn(jax.random.PRNGKey(0), idxs, dd)
        assert obs is None
        assert x.shape == (4, 8, 8, 2)
        x = np.asarray(x)
        lab = np.asarray(lab)
        # channel 0 = u(t0): integer part is the item index
        items = np.floor(x[:, 0, 0, 0] + 1e-4)
        np.testing.assert_array_equal(items, [3, 0, 5, 1])
        # decode t0/tf from the fractional parts, check tau and ordering
        t0 = np.round((x[:, 0, 0, 0] - items) * 10).astype(int)
        tf = np.round((x[:, 0, 0, 1] - items) * 10).astype(int)
        assert (tf >= t0).all() and (tf < 5).all()
        np.testing.assert_allclose(lab[:, 0], t_steps[tf] - t_steps[t0],
                                   rtol=1e-5)
        np.testing.assert_allclose(lab[:, 1], np.asarray([3, 0, 5, 1]) * 2.0)

    def test_joint_start_at_t0(self):
        dd, _ = _toy_device_data()
        fn = dp.make_batch_fn("joint", start_at_t0=True)
        x, lab, _ = fn(jax.random.PRNGKey(1), jnp.arange(6), dd)
        frac = np.asarray(x[:, 0, 0, 0]) % 1.0
        np.testing.assert_allclose(frac, 0.0, atol=1e-5)

    def test_forward_semantics(self):
        dd, _ = _toy_device_data()
        fn = dp.make_batch_fn("forward", start_at_t0=False)
        x, lab, obs = fn(jax.random.PRNGKey(2), jnp.asarray([2, 4]), dd)
        assert x.shape == (2, 8, 8, 1) and obs.shape == (2, 8, 8, 1)
        items = np.floor(np.asarray(obs)[:, 0, 0, 0] + 1e-4)
        np.testing.assert_array_equal(items, [2, 4])

    def test_no_time(self):
        dd, _ = _toy_device_data()
        fn = dp.make_batch_fn("no_time", start_at_t0=False)
        x, lab, obs = fn(jax.random.PRNGKey(3), jnp.asarray([1]), dd)
        np.testing.assert_allclose(np.asarray(x[0, 0, 0]), [1.0, 1.4],
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(lab), [[2.0]])


class TestDeviceEpoch:
    def _setup(self):
        net = EDMUNet(img_channels=2, label_dim=2, base_channels=32,
                      channel_mults=(1, 2), num_res_blocks=1)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, 8, 2)), jnp.ones(1),
                          jnp.zeros((1, 2)), None)

        def apply_fn(p, xx, ss, ll, oo, train=False, rngs=None):
            return net.apply(p, xx, ss, ll, oo, train=train, rngs=rngs)

        return Denoiser(apply_fn, params)

    def test_epoch_trains_and_counts_steps(self):
        dd, _ = _toy_device_data(n=8, t=5, h=8, w=8, c=1)
        den = self._setup()
        tx = make_optimizer(1e-3, grad_clip=1.0)
        raw = make_train_step(den, EDMLoss(), tx, EMAConfig(), jit=False)
        batch_fn = dp.make_batch_fn("joint", start_at_t0=False)
        epoch = dp.make_epoch_fn(raw, batch_fn, n=8, batch_size=4)

        state = init_train_state(den.params, tx)
        losses = []
        for e in range(3):
            state, loss, aux = epoch(state, jax.random.PRNGKey(e), dd)
            losses.append(float(loss))
            assert "grad_norm" in aux and np.isfinite(float(aux["grad_norm"]))
        assert int(state.step) == 3 * 2          # 2 batches per epoch
        assert all(np.isfinite(losses))

    def test_epoch_sharded_matches_counts(self):
        """Same epoch under the 8-device mesh constraint still runs and
        produces finite loss (DP sharding path)."""
        mesh = make_mesh()
        dd, _ = _toy_device_data(n=8, t=5, h=8, w=8, c=1)
        den = self._setup()
        tx = make_optimizer(1e-3)
        raw = make_train_step(den, EDMLoss(), tx, EMAConfig(), jit=False)
        batch_fn = dp.make_batch_fn("joint", start_at_t0=False)
        epoch = dp.make_epoch_fn(raw, batch_fn, n=8, batch_size=8,
                                 mesh=mesh)
        state = init_train_state(den.params, tx)
        with mesh:
            state, loss, _ = epoch(state, jax.random.PRNGKey(0), dd)
        assert np.isfinite(float(loss))
        assert int(state.step) == 1

    def test_val_fn_deterministic(self):
        dd, _ = _toy_device_data(n=8)
        den = self._setup()
        raw_eval = make_eval_step(den, EDMLoss(), jit=False)
        batch_fn = dp.make_batch_fn("joint", start_at_t0=False)
        val = dp.make_val_fn(raw_eval, batch_fn, n=8, batch_size=4)
        v1 = float(val(den.params, jax.random.PRNGKey(7), dd))
        v2 = float(val(den.params, jax.random.PRNGKey(7), dd))
        assert v1 == v2 and np.isfinite(v1)
