"""HDF5 dataset I/O with the reference schema.

Schema parity with the reference (reference: src/diffusion_pde/pdes/
utils.py:70-128): datasets ``A (N, ch, H, W)``, ``U (N, ch, H, W, T)``,
optional ``labels (N, label_dim)``, ``t_steps (T,)``; attrs ``T, dx, dy,
N`` plus free-form extras. Files written by the reference load here
unchanged and vice versa. Layout conversion to the framework's NHWC
happens in the dataset classes, not in the files.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import h5py
import numpy as np


def save_data(
    filepath: str | Path,
    a: np.ndarray,
    u: np.ndarray,
    labels: np.ndarray | None,
    t_steps: np.ndarray,
    t_final: float,
    dx: float,
    dy: float,
    **attrs,
) -> None:
    """Write the canonical dataset file (reference pdes/utils.py:70-128)."""
    attrs["N"] = a.shape[0]
    Path(filepath).parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(filepath, "w") as f:
        f.create_dataset("A", data=a)
        f.create_dataset("U", data=u)
        if labels is not None:
            f.create_dataset("labels", data=labels)
        f.create_dataset("t_steps", data=t_steps)
        f.attrs["T"] = t_final
        f.attrs["dx"] = dx
        f.attrs["dy"] = dy
        for key, value in attrs.items():
            f.attrs[key] = value


class ShardStore:
    """Idempotent shard store for restartable dataset generation.

    The reference survives datagen interruption only through its
    interval-sharded output files (reference src/diffusion_pde/pdes/
    llg.py:195-264: one file per worker interval, merged afterwards); an
    interrupted run restarts from the last complete interval. This is the
    same idea without the multiprocessing: while a dataset is being
    generated, each batch is written atomically (tmp + rename) to
    ``<final>.shards/shard_<start>.npy``; a rerun of the same command
    finds the complete shards, skips their computation, and generation
    continues where it stopped. ``finalize()`` removes the shard
    directory once the final HDF5 exists.
    """

    def __init__(self, final_path: str | Path):
        self.final = Path(final_path)
        self.dir = self.final.with_name(self.final.name + ".shards")

    def _path(self, start: int) -> Path:
        return self.dir / f"shard_{start:07d}.npy"

    def has(self, start: int) -> bool:
        return self._path(start).exists()

    def load(self, start: int) -> np.ndarray:
        return np.load(self._path(start))

    def save(self, start: int, arr: np.ndarray) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        tmp = self._path(start).with_suffix(".tmp.npy")
        np.save(tmp, arr)
        tmp.rename(self._path(start))

    def finalize(self) -> None:
        if self.dir.exists():
            for p in self.dir.iterdir():
                p.unlink()
            self.dir.rmdir()


@dataclass
class RawDataset:
    u: np.ndarray                  # (N, ch, H, W, T) reference layout
    t_steps: np.ndarray            # (T,)
    labels: np.ndarray | None      # (N, label_dim) or None
    attrs: dict

    @property
    def dx(self) -> float:
        return float(self.attrs["dx"])


def load_data(filepath: str | Path) -> RawDataset:
    """Load U/t_steps/labels + attrs (reference dataset.py:280-283)."""
    with h5py.File(filepath, "r") as f:
        u = f["U"][:]
        t_steps = f["t_steps"][:]
        labels = f["labels"][:] if "labels" in f else None
        attrs = dict(f.attrs)
    return RawDataset(u=u, t_steps=t_steps, labels=labels, attrs=attrs)


def load_attr(filepath: str | Path, name: str):
    with h5py.File(filepath, "r") as f:
        return f.attrs[name]
