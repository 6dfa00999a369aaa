"""EMA warmup parity with the reference EMAWrapper, and dropout rng wiring
through the train step (VERDICT round-1 items 5 and 9)."""

import jax
import jax.numpy as jnp
import numpy as np

from dpde_tpu.models import Denoiser, EDMLoss, EDMUNet
from dpde_tpu.models.ema import EMAConfig, ema_decay, ema_update
from dpde_tpu.training import init_train_state, make_optimizer, make_train_step


def _reference_ema(params_seq, decay, warmup, update_every):
    """Reference EMAWrapper semantics re-expressed on scalars
    (reference nets.py:370-419): num_updates increments on EVERY update()
    call (i.e. every train step); updates are applied only when
    num_updates % update_every == 0; the warmup fraction uses the
    incremented call counter."""
    ema = params_seq[0]
    num_updates = 0
    for p in params_seq[1:]:
        num_updates += 1
        if num_updates % update_every != 0:
            continue
        frac = min(1.0, num_updates / warmup) if warmup > 0 else 1.0
        d = 1.0 - frac * (1.0 - decay)
        ema = d * ema + (1.0 - d) * p
    return ema


def test_ema_matches_reference_semantics():
    """Step-for-step parity including warmup and update_every gating."""
    for update_every in (1, 3):
        cfg = EMAConfig(decay=0.9, warmup_steps=5, update_every=update_every)
        rng = np.random.default_rng(0)
        seq = rng.standard_normal(12).astype(np.float64)

        ema = jnp.asarray(seq[0])
        for step, p in enumerate(seq[1:], start=1):
            ema = ema_update(cfg, ema, jnp.asarray(p),
                             jnp.asarray(step, jnp.int32))
        want = _reference_ema(seq, 0.9, 5, update_every)
        np.testing.assert_allclose(float(ema), want, rtol=1e-4)


def test_ema_decay_warmup_ramp():
    """Reference ramp d = 1 - frac*(1-decay) DESCENDS from 1.0 to decay
    (nets.py:395-400)."""
    cfg = EMAConfig(decay=0.999, warmup_steps=20)
    d1 = float(ema_decay(cfg, jnp.asarray(1)))
    d10 = float(ema_decay(cfg, jnp.asarray(10)))
    d100 = float(ema_decay(cfg, jnp.asarray(100)))
    assert d1 > d10 > d100
    np.testing.assert_allclose(d100, 0.999, rtol=1e-6)


def _tiny_denoiser(dropout):
    net = EDMUNet(img_channels=2, label_dim=2, base_channels=32,
                  channel_mults=(1, 2), num_res_blocks=1, dropout=dropout)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 2)),
                      jnp.ones(1), jnp.zeros((1, 2)), None)

    def apply_fn(p, xx, ss, ll, oo, train=False, rngs=None):
        return net.apply(p, xx, ss, ll, oo, train=train, rngs=rngs)

    return Denoiser(apply_fn, params)


def test_train_step_with_dropout():
    """model.dropout > 0 must train, not crash (round-1 latent crash: no
    'dropout' rng reached flax)."""
    den = _tiny_denoiser(dropout=0.3)
    tx = make_optimizer(1e-3)
    step_fn = make_train_step(den, EDMLoss(), tx, EMAConfig())
    state = init_train_state(den.params, tx)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((4, 16, 16, 2)).astype(np.float32))
    lbl = jnp.zeros((4, 2), jnp.float32)
    state, loss, _ = step_fn(state, jax.random.PRNGKey(1), x, lbl, None)
    assert np.isfinite(float(loss))
    assert int(state.step) == 1
