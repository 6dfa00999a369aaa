"""Pretrained-model / dataset path conventions (reference:
src/diffusion_pde/utils.py:79-146 ResultsObject).

The reference resolves model/data paths from a config file and can pull
models from wandb Artifacts. Here the same naming convention
(``{pde}_{data}_{model}``) maps onto local Orbax checkpoints under
``pretrained_models/``; wandb download is attempted only when wandb is
importable.
"""

from __future__ import annotations

from pathlib import Path

from .config import Config, load_config
from .paths import get_repo_root


class ResultsObject:
    def __init__(self, cfg_path: str | Path | None = None,
                 cfg: Config | None = None):
        self.root_path = get_repo_root()
        if cfg is None:
            cfg_path = Path(cfg_path)
            if not cfg_path.is_absolute():
                cfg_path = self.root_path / cfg_path
            cfg = load_config(cfg_path.parent, cfg_path.stem)
        self.cfg = cfg

        pde_name = cfg.dataset.data.pde.lower()
        data_name = cfg.dataset.data.name.lower()
        model_name = cfg.model.name.lower()
        self.save_name = (f"{pde_name}_{data_name}_{model_name}"
                          .replace(" ", "_").replace("-", "_"))
        self._model_path = (self.root_path / "pretrained_models"
                            / self.save_name)
        self._data_path = self.root_path / cfg.dataset.data.datapath

    @property
    def model_path(self) -> Path:
        if self._model_path.exists():
            return self._model_path
        raise FileNotFoundError(
            f"Model path does not exist: {self._model_path}")

    @property
    def data_path(self) -> Path:
        if self._data_path.exists():
            return self._data_path
        raise FileNotFoundError(
            f"Data path does not exist: {self._data_path}")

    def get_wandb_model(self, root: str = "pretrained_models/wandb",
                        version: str = "latest") -> Path:
        """Download the model artifact via wandb when available
        (reference utils.py:138-146)."""
        try:
            import wandb
        except ImportError as e:
            raise RuntimeError(
                "wandb is not installed; use local pretrained_models/"
            ) from e
        api = wandb.Api()
        name = self.save_name.replace("_", "-")
        artifact = api.artifact(f"{name}:{version}")
        root_p = Path(root)
        if not root_p.is_absolute():
            root_p = self.root_path / root_p
        artifact_dir = artifact.download(root=str(root_p))
        return Path(artifact_dir) / self.save_name
