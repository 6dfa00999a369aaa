"""End-to-end slice: datagen -> loader -> DP train on 8-device CPU mesh ->
checkpoint/resume -> sampling (SURVEY.md section 7 'minimum end-to-end
slice' + section 4 items 5-6)."""

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpde_tpu.data import get_dataloaders, get_validation_view
from dpde_tpu.data.io import load_data, save_data
from dpde_tpu.models import build_loss_from_config, init_denoiser
from dpde_tpu.parallel import make_mesh
from dpde_tpu.physics import heat as heat_phys
from dpde_tpu.sampling import JointSampler, UnconditionalSampler, pde_losses
from dpde_tpu.training import train
from dpde_tpu.utils.config import load_config

CONF = Path(__file__).parent.parent / "conf"


@pytest.fixture(scope="module")
def tiny_heat_file(tmp_path_factory):
    """Small heat dataset in the reference HDF5 schema."""
    path = tmp_path_factory.mktemp("data") / "heat_tiny.hdf5"
    key = jax.random.PRNGKey(0)
    dt = np.diff(heat_phys.time_grid(6, 0.5))
    u, a, t_steps, labels = heat_phys.generate_heat(
        key, n=24, batch=24, s=16, steps=6, dt=dt)
    save_data(filepath=path, a=a, u=u, labels=labels, t_steps=t_steps,
              t_final=0.5, dx=1 / 15, dy=1 / 15)
    return path


@pytest.fixture(scope="module")
def tiny_cfg(tiny_heat_file):
    return load_config(CONF, "train", [
        f"dataset.data.datapath={tiny_heat_file}",
        "dataset.training.batch_size=8",
        "dataset.training.num_epochs=2",
        "dataset.training.val_interval=1",
        "dataset.training.checkpoint_interval=1",
        "dataset.training.ema_warmup=2",
        "model.base_ch=32",
        "model.ch_mults=[1,2]",
        "model.n_res_blocks=1",
        "+run.seed=0",
    ])


def test_schema_roundtrip(tiny_heat_file):
    raw = load_data(tiny_heat_file)
    assert raw.u.shape == (24, 1, 16, 16, 7)
    assert raw.labels.shape == (24, 1)
    assert abs(raw.dx - 1 / 15) < 1e-9


def test_dataloaders_route_and_shapes(tiny_cfg):
    train_iter, val_iter = get_dataloaders(tiny_cfg)
    batch = next(iter(train_iter))
    # joint: X = concat(u(t0), u(tf)) -> 2 channels NHWC
    assert batch["X"].shape == (8, 16, 16, 2)
    # labels = [tau, alpha]
    assert batch["labels"].shape == (8, 2)
    assert (batch["labels"][:, 0] >= 0).all()
    # two epochs give different (t0, tf) draws
    b2 = next(iter(train_iter))
    assert not np.allclose(batch["X"], b2["X"])


def test_train_checkpoints_resume_sample(tiny_cfg, tmp_path, caplog):
    mesh = make_mesh()  # 8 virtual CPU devices via conftest
    assert len(jax.devices()) == 8

    train_iter, val_iter = get_dataloaders(tiny_cfg)
    _, denoiser = init_denoiser(tiny_cfg, jax.random.PRNGKey(0), (16, 16), 2)
    loss_fn = build_loss_from_config(tiny_cfg)

    kwargs = dict(
        epochs=2, lr=1e-3, grad_clip=1.0, val_interval=1,
        ema_decay=0.999, ema_warmup=2, checkpoint_interval=1,
        save_dir=tmp_path, wandb_kwargs={"mode": "disabled",
                                         "dir": str(tmp_path)},
        mesh=mesh,
    )
    with caplog.at_level(logging.INFO):
        state = train(denoiser, train_iter, val_iter, loss_fn, **kwargs)
    assert int(state.step) == 2 * len(train_iter)
    assert (tmp_path / "checkpoints" / "ema_model_best").exists()
    assert (tmp_path / "checkpoints" / "model_epoch_2").exists()
    assert (tmp_path / "model").exists()
    assert (tmp_path / "ema_model").exists()

    # resume: a third epoch continues from step count, not from zero
    kwargs["epochs"] = 3
    state2 = train(denoiser, train_iter, val_iter, loss_fn, **kwargs)
    assert int(state2.step) == 3 * len(train_iter)

    # sample unconditionally from the EMA params
    den_ema = denoiser.replace_params(state2.ema_params)
    sampler = UnconditionalSampler(den_ema, (16, 16), 2, 4, num_steps=8)
    out = sampler.sample(jax.random.PRNGKey(1),
                         labels=jnp.zeros((4, 2)).at[:, 1].set(0.5))
    assert out.shape == (4, 16, 16, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_guided_sampling_recovers_observations(tiny_heat_file):
    """With strong observation guidance and full masks, samples should move
    toward the observations even with an untrained net — the DPS gradient
    path end-to-end (reference JointSampler semantics)."""
    raw = load_data(tiny_heat_file)
    a = np.moveaxis(raw.u[:1, :, :, :, 0], 1, -1).astype(np.float32)
    u = np.moveaxis(raw.u[:1, :, :, :, -1], 1, -1).astype(np.float32)
    tau = raw.t_steps[-1] - raw.t_steps[0]
    labels = jnp.asarray([[tau, float(raw.labels[0, 0])]] * 4)

    cfg = load_config(CONF, "train", [
        "model.base_ch=32", "model.ch_mults=[1,2]", "model.n_res_blocks=1"])
    _, denoiser = init_denoiser(cfg, jax.random.PRNGKey(2), (16, 16), 2)

    mask = np.ones((16, 16), dtype=bool)
    sampler = JointSampler(
        denoiser, (16, 16), 2, 4, ch_a=1,
        loss_fn=pde_losses.heat_loss2, loss_kwargs={"dx": raw.dx},
        num_steps=16)
    x, losses = sampler.sample(
        jax.random.PRNGKey(3), labels, a, u, mask, mask,
        zeta_a=10.0, zeta_u=10.0, zeta_pde=0.1, return_losses=True)
    assert np.isfinite(np.asarray(x)).all()
    assert losses.shape == (16, 4)
    # With an untrained net the denoised estimate is ~c_skip*x, so the obs
    # loss rises mid-run as c_skip -> 1 and guidance must pull it back
    # down (the reference's zeta phenomenology, BASELINE.md zeta row):
    # final loss well below both the mid-run peak and the starting value.
    assert losses[-1, 0] < 0.55 * losses[:, 0].max()
    assert losses[:, 0].min() < 0.5 * losses[0, 0]
    assert losses[-1, 1] < 0.7 * losses[:, 1].max()
