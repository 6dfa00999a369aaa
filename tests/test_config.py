"""Config system tests (hydra-compatible subset, utils/config.py)."""

from pathlib import Path

import pytest

from dpde_tpu.utils.config import load_config

CONF = Path(__file__).parent.parent / "conf"


def test_compose_train_defaults():
    cfg = load_config(CONF, "train")
    assert cfg.dataset.data.name == "heat_logt"
    assert cfg.model.name == "unet-v2"
    assert cfg.dataset.training.batch_size == 64
    assert cfg.dataset.net.in_ch == 2


def test_group_override():
    cfg = load_config(CONF, "train", ["dataset=llg_eq_joint", "model=unet"])
    assert cfg.dataset.data.pde == "llg"
    assert cfg.dataset.net.in_ch == 6
    assert cfg.model.name == "unet-small"


def test_leaf_override_types():
    cfg = load_config(CONF, "train", [
        "dataset.training.batch_size=32",
        "dataset.training.learning_rate=3e-4",
        "dataset.training.shuffle=false",
    ])
    assert cfg.dataset.training.batch_size == 32
    assert abs(cfg.dataset.training.learning_rate - 3e-4) < 1e-12
    assert cfg.dataset.training.shuffle is False


def test_add_override():
    cfg = load_config(CONF, "train", ["+extra.flag=7"])
    assert cfg.extra.flag == 7


def test_unknown_leaf_raises():
    with pytest.raises(KeyError):
        load_config(CONF, "train", ["dataset.training.nope=1"])


def test_test_config_observations():
    cfg = load_config(CONF, "test", ["observations.interior_a=0.2"])
    assert cfg.observations.interior_a == 0.2
    assert cfg.sampling_conf.num_steps == 50
    assert cfg.sampling_conf.zeta_pde == 20.0


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("WANDB_MODE", "disabled")
    cfg = load_config(CONF, "train")
    assert cfg.wandb.mode == "disabled"


def test_to_dict_roundtrip():
    cfg = load_config(CONF, "train")
    d = cfg.to_dict()
    assert isinstance(d, dict)
    assert d["model"]["name"] == "unet-v2"
