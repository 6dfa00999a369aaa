"""Orbax checkpointing with true resume.

The reference only torch.saves state_dicts on a schedule and has *no*
resume path — fine_tune.py is a weights-only warm start (reference:
training_loop.py:114-131, SURVEY.md section 5). Here the full train state
(params, optimizer state, EMA, step/epoch counters, best-val) round-trips
through Orbax so an interrupted run continues exactly, and the reference's
artifacts are still produced: ``checkpoints/ema_model_best``, periodic
``model_epoch_{n}``, final ``model`` + ``ema_model``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- full train-state checkpoints (resume) ---------------------------
    def save_state(self, name: str, state_tree: Any) -> None:
        path = self.dir / name
        self._ckptr.save(path, _as_host(state_tree), force=True)
        self._ckptr.wait_until_finished()

    def restore_state(self, name: str, template: Any) -> Any:
        return self._ckptr.restore(self.dir / name, target=template)

    def has(self, name: str) -> bool:
        return (self.dir / name).exists()

    # -- weights-only (reference .pth analogues) -------------------------
    def save_params(self, name: str, params: Any) -> None:
        self.save_state(name, params)

    def restore_params(self, name: str, template: Any) -> Any:
        return self.restore_state(name, template)


def load_pretrained_params(path: str | Path, template: Any,
                           partial: bool = False) -> Any:
    """Load a weights-only checkpoint for fine-tune / test entry points
    (reference fine_tune.py:75-77, test2.py:79).

    ``partial=True`` enables cross-architecture warm starts (e.g. the
    2-channel heat model seeding the 6-channel LLG model, BASELINE.json
    configs[3]): leaves whose path AND shape match the template are taken
    from the checkpoint; the rest (in/out convs, label embedding) keep
    the template's fresh initialisation. Returns (params, report) where
    report lists loaded/skipped leaf paths."""
    ckptr = ocp.StandardCheckpointer()
    if not partial:
        return ckptr.restore(Path(path).resolve(), target=template)

    stored = ckptr.restore(Path(path).resolve())   # raw tree, no template
    flat_stored = _flatten_with_paths(stored)
    loaded, skipped = [], []

    def merge(p, leaf):
        src = flat_stored.get(p)
        if src is not None and np.shape(src) == np.shape(leaf) and \
                np.asarray(src).dtype.kind == np.asarray(leaf).dtype.kind:
            loaded.append(p)
            return jax.numpy.asarray(src, dtype=leaf.dtype)
        skipped.append(p)
        return leaf

    out = jax.tree_util.tree_map_with_path(
        lambda kp, leaf: merge(_keystr(kp), leaf), template)
    return out, {"loaded": loaded, "skipped": skipped}


def _keystr(kp) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
        for k in kp)


def _flatten_with_paths(tree: Any) -> dict:
    out = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[_keystr(kp)] = leaf
    return out
