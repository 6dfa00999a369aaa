"""Entry-point flow tests: forward-method training, fine-tune warm start,
physics (PIDM) training — the remaining reference workflows."""

from pathlib import Path

import jax
import numpy as np
import pytest

from dpde_tpu.data import get_dataloaders
from dpde_tpu.data.io import save_data
from dpde_tpu.models import build_loss_from_config, init_denoiser
from dpde_tpu.physics import heat as heat_phys
from dpde_tpu.training import (
    CheckpointManager,
    load_pretrained_params,
    train,
)
from dpde_tpu.utils.config import load_config

CONF = Path(__file__).parent.parent / "conf"


@pytest.fixture(scope="module")
def tiny_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "heat_tiny2.hdf5"
    key = jax.random.PRNGKey(1)
    dt = np.diff(heat_phys.time_grid(5, 0.5))
    u, a, t_steps, labels = heat_phys.generate_heat(
        key, n=16, batch=16, s=16, steps=5, dt=dt)
    save_data(filepath=path, a=a, u=u, labels=labels, t_steps=t_steps,
              t_final=0.5, dx=1 / 15, dy=1 / 15)
    return path


def _tiny_cfg(tiny_file, extra=()):
    return load_config(CONF, "train", [
        f"dataset.data.datapath={tiny_file}",
        "dataset.training.batch_size=8",
        "dataset.training.num_epochs=1",
        "dataset.training.val_interval=1",
        "model.base_ch=32", "model.ch_mults=[1,2]", "model.n_res_blocks=1",
        *extra,
    ])


def test_forward_method_training(tiny_file, tmp_path):
    """'forward' method: obs = u(t0) conditions the net (reference
    DiffusionDatasetForward + obs_channels path)."""
    cfg = _tiny_cfg(tiny_file, ["dataset=heat_eq_lineart_forward",
                                f"dataset.data.datapath={tiny_file}",
                                "dataset.training.batch_size=8",
                                "dataset.training.num_epochs=1",
                                "dataset.training.val_interval=1",
                                "model.base_ch=32", "model.ch_mults=[1,2]",
                                "model.n_res_blocks=1"])
    assert cfg.dataset.method == "forward"
    train_iter, val_iter = get_dataloaders(cfg)
    b = next(iter(train_iter))
    assert b["obs"].shape == (8, 16, 16, 1)
    _, den = init_denoiser(cfg, jax.random.PRNGKey(0), (16, 16), 1)
    loss_fn = build_loss_from_config(cfg)
    state = train(den, train_iter, val_iter, loss_fn, epochs=1, lr=1e-3,
                  val_interval=1, ema_decay=0.999, save_dir=tmp_path,
                  wandb_kwargs={"mode": "disabled", "dir": str(tmp_path)})
    assert int(state.step) == len(train_iter)


def test_fine_tune_warm_start(tiny_file, tmp_path):
    """Weights-only warm start (reference fine_tune.py:75-77): params load
    from a prior checkpoint, optimizer state fresh."""
    cfg = _tiny_cfg(tiny_file)
    _, den = init_denoiser(cfg, jax.random.PRNGKey(0), (16, 16), 2)

    ckpt = CheckpointManager(tmp_path)
    bumped = jax.tree_util.tree_map(lambda p: p + 1.0, den.params)
    ckpt.save_params("pretrained", bumped)

    loaded = load_pretrained_params(tmp_path / "pretrained", den.params)
    l0 = jax.tree_util.tree_leaves(den.params)[0]
    l1 = jax.tree_util.tree_leaves(loaded)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0) + 1.0,
                               rtol=1e-6)


def test_physics_loss_training(tiny_file, tmp_path):
    """PIDM (EDMHeatLoss) training path end to end (reference
    physics_loss=true route, utils.py:18-35)."""
    cfg = _tiny_cfg(tiny_file, ["dataset.training.physics_loss=true",
                                "dataset.residual_estimation=ME"])
    train_iter, val_iter = get_dataloaders(cfg)
    _, den = init_denoiser(cfg, jax.random.PRNGKey(0), (16, 16), 2)
    loss_fn = build_loss_from_config(cfg)
    from dpde_tpu.models.losses import EDMHeatLoss

    assert isinstance(loss_fn, EDMHeatLoss)
    assert abs(loss_fn.dx - 1 / 15) < 1e-9
    state = train(den, train_iter, val_iter, loss_fn, epochs=1, lr=1e-3,
                  val_interval=1, ema_decay=0.999, save_dir=tmp_path,
                  wandb_kwargs={"mode": "disabled", "dir": str(tmp_path)})
    assert int(state.step) == len(train_iter)
