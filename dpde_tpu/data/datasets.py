"""Dataset views and epoch iterators.

Re-design of the reference torch Datasets/DataLoaders (reference:
src/diffusion_pde/datasets/dataset.py). The per-item ``__getitem__`` +
collate pattern becomes *vectorised epoch iterators*: each batch is built
with one fancy-indexing gather over the in-memory arrays (the reference's
random (t0, tf) sampling, dataset.py:80-99, drawn for the whole batch at
once from a seeded numpy Generator), and yielded as NHWC numpy dicts ready
for ``device_put`` with a sharded layout.

Batches are always full-size: the tail of an epoch is dropped when it does
not divide batch_size (keeps jit shapes static and mesh shards even).
Layout: HDF5 stores (N, ch, H, W, T) (reference schema); iterators emit
channels-last (B, H, W, ch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..utils.paths import resolve_data_path
from .io import load_data


def _to_nhwc(x: np.ndarray) -> np.ndarray:
    """(B, ch, H, W) -> (B, H, W, ch)"""
    return np.ascontiguousarray(np.moveaxis(x, 1, -1))


class _EpochIterable:
    """Base: owns data (N, ch, H, W, T), labels, rng, batching."""

    def __init__(self, data: np.ndarray, labels: np.ndarray | None,
                 batch_size: int, shuffle: bool, seed: int = 0):
        assert data.ndim == 5, (
            f"data must be (N, ch, H, W, T), got {data.shape}")
        self.data = np.asarray(data, dtype=np.float32)
        self.labels = (np.asarray(labels, dtype=np.float32)
                       if labels is not None else None)
        if self.labels is not None and self.labels.ndim == 1:
            self.labels = self.labels.reshape(-1, 1)
        self.n = data.shape[0]
        self.t = data.shape[-1]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return max(1, self.n // self.batch_size) \
            if self.n >= self.batch_size else 1

    def _index_batches(self) -> Iterator[np.ndarray]:
        idx = np.arange(self.n)
        if self.shuffle:
            self.rng.shuffle(idx)
        bs = min(self.batch_size, self.n)
        n_full = max(1, self.n // bs)
        for i in range(n_full):
            yield idx[i * bs:(i + 1) * bs]


class DiffusionIterable(_EpochIterable):
    """Joint-method batches (reference DiffusionDataset, dataset.py:35-99):
    X = concat(u(t0), u(tf)) channels-last, labels = [tau, *static]."""

    def __init__(self, data, t_steps, labels=None, start_at_t0=True,
                 batch_size=64, shuffle=True, seed=0):
        super().__init__(data, labels, batch_size, shuffle, seed)
        self.t_steps = np.asarray(t_steps, dtype=np.float32)
        self.start_at_t0 = start_at_t0

    def __iter__(self):
        for idx in self._index_batches():
            b = len(idx)
            if self.start_at_t0:
                t0 = np.zeros(b, dtype=np.int64)
            else:
                t0 = self.rng.integers(0, self.t, size=b)
            # tf uniform in [t0, T): mirrors torch.randint(t0, T)
            tf = t0 + (self.rng.random(b) * (self.t - t0)).astype(np.int64)
            snap0 = np.take_along_axis(
                self.data[idx], t0[:, None, None, None, None], axis=-1
            )[..., 0]
            snapf = np.take_along_axis(
                self.data[idx], tf[:, None, None, None, None], axis=-1
            )[..., 0]
            x = np.concatenate([_to_nhwc(snap0), _to_nhwc(snapf)], axis=-1)
            tau = self.t_steps[tf] - self.t_steps[t0]
            label = None
            if self.labels is not None:
                label = np.concatenate([tau[:, None], self.labels[idx]],
                                       axis=1)
            yield {"X": x, "labels": label}


class DiffusionForwardIterable(DiffusionIterable):
    """Forward-method batches (reference DiffusionDatasetForward,
    dataset.py:102-165): obs = u(t0) as net conditioning, X = u(tf)."""

    def __init__(self, data, t_steps, labels=None, start_at_t0=False,
                 batch_size=64, shuffle=True, seed=0):
        super().__init__(data, t_steps, labels, start_at_t0, batch_size,
                         shuffle, seed)

    def __iter__(self):
        for idx in self._index_batches():
            b = len(idx)
            if self.start_at_t0:
                t0 = np.zeros(b, dtype=np.int64)
            else:
                t0 = self.rng.integers(0, self.t, size=b)
            tf = t0 + (self.rng.random(b) * (self.t - t0)).astype(np.int64)
            obs = np.take_along_axis(
                self.data[idx], t0[:, None, None, None, None], axis=-1
            )[..., 0]
            x = np.take_along_axis(
                self.data[idx], tf[:, None, None, None, None], axis=-1
            )[..., 0]
            tau = self.t_steps[tf] - self.t_steps[t0]
            label = None
            if self.labels is not None:
                label = np.concatenate([tau[:, None], self.labels[idx]],
                                       axis=1)
            yield {"obs": _to_nhwc(obs), "X": _to_nhwc(x), "labels": label}


class NoTimeIterable(_EpochIterable):
    """First/last-snapshot pairs (reference NoTimeDataset, dataset.py:7-32)."""

    def __iter__(self):
        for idx in self._index_batches():
            x = np.concatenate(
                [_to_nhwc(self.data[idx, ..., 0]),
                 _to_nhwc(self.data[idx, ..., -1])], axis=-1)
            label = self.labels[idx] if self.labels is not None else None
            yield {"X": x, "labels": label}


class ValidationView:
    """Expanded (A, U(t)) pairs for evaluation (reference ValidationDataset,
    dataset.py:169-238). Precomputes the full N*T expansion once; batches
    are contiguous slices (deterministic order, batch-size configurable
    where the reference was fixed at 1, dataset.py:338)."""

    def __init__(self, data: np.ndarray, t_steps: np.ndarray,
                 labels: np.ndarray | None = None,
                 time_as_label: bool = False,
                 include_t0_as_target: bool = False):
        data = np.asarray(data, dtype=np.float32)
        t_steps = np.asarray(t_steps, dtype=np.float32)
        n, c, h, w, t = data.shape
        if len(t_steps) != t:
            raise ValueError(
                f"len(t_steps)={len(t_steps)} != data time dim {t}")
        if len(t_steps) < 2:
            raise ValueError("t_steps must contain at least 2 time steps")
        t_eff = t if include_t0_as_target else t - 1
        t_start = 0 if include_t0_as_target else 1

        self.a = np.repeat(_to_nhwc(data[..., 0]), t_eff, axis=0)
        u = np.moveaxis(data[..., t_start:], -1, 1)    # (N, T', c, h, w)
        self.u = _to_nhwc(u.reshape(n * t_eff, c, h, w))

        self.labels = None
        if labels is not None:
            labels = np.asarray(labels, dtype=np.float32)
            if labels.ndim == 1:
                labels = labels.reshape(-1, 1)
            lab = np.repeat(labels, t_eff, axis=0)
            if time_as_label:
                texp = np.tile(t_steps[t_start:], n)[:, None]
                lab = np.concatenate([texp, lab], axis=1)
            self.labels = lab

        self.n = n * t_eff
        self.c = c

    def __len__(self) -> int:
        return self.n

    def subset(self, indices) -> "ValidationView":
        """Shallow re-indexed view (row order = ``indices``). Used to
        evaluate a spread of items across the trajectory x time expansion
        instead of the first rows only — the expansion is time-major, so
        the first K rows are the *earliest* times of trajectory 0, a
        systematically unrepresentative (and for PDE residuals, hardest)
        corner of the eval domain."""
        import copy

        sub = copy.copy(self)
        idx = np.asarray(indices)
        sub.a = self.a[idx]
        sub.u = self.u[idx]
        sub.labels = self.labels[idx] if self.labels is not None else None
        sub.n = len(idx)
        return sub

    def batches(self, batch_size: int = 1, limit: int | None = None):
        stop = self.n if limit is None else min(self.n, limit)
        for i in range(0, stop, batch_size):
            j = min(i + batch_size, stop)
            yield {
                "A": self.a[i:j],
                "U": self.u[i:j],
                "labels": self.labels[i:j]
                if self.labels is not None else None,
            }


def get_dataloaders(cfg, seed: int = 0):
    """Load HDF5, split train/val, route by dataset name/method
    (reference get_dataloaders, dataset.py:251-306)."""
    raw = load_data(resolve_data_path(cfg.dataset.data.datapath))
    method = cfg.dataset.method
    start_at_t0 = cfg.dataset.start_at_t0
    batch_size = cfg.dataset.training.batch_size
    shuffle = cfg.dataset.training.shuffle
    val_percent = cfg.dataset.training.val_percent

    n = raw.u.shape[0]
    val_size = int(n * val_percent)
    train_size = n - val_size
    rng = np.random.default_rng(seed)
    idxs = np.arange(n)
    if shuffle:
        rng.shuffle(idxs)
    tr, va = idxs[:train_size], idxs[train_size:]

    name = cfg.dataset.data.name.lower()
    lab = raw.labels

    def pick(ix, shuf, s):
        lab_ix = lab[ix] if lab is not None else None
        if "no_cond" in name or "no_time" in name:
            return NoTimeIterable(raw.u[ix], lab_ix, batch_size, shuf, s)
        if method == "forward":
            return DiffusionForwardIterable(
                raw.u[ix], raw.t_steps, lab_ix, start_at_t0, batch_size,
                shuf, s)
        return DiffusionIterable(
            raw.u[ix], raw.t_steps, lab_ix, start_at_t0, batch_size, shuf, s)

    return pick(tr, shuffle, seed), pick(va, False, seed + 1)


def get_validation_view(data_path, time_as_label: bool,
                        include_t0_as_target: bool) -> ValidationView:
    """(reference get_validation_dataloader, dataset.py:309-339)"""
    raw = load_data(resolve_data_path(data_path))
    return ValidationView(raw.u, raw.t_steps, raw.labels,
                          time_as_label=time_as_label,
                          include_t0_as_target=include_t0_as_target)
