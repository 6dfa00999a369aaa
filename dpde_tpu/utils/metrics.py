"""Metrics / experiment-tracking shim.

The reference logs everything quantitative to Weights & Biases
(reference: training_loop.py:40, loss.py:32-33, model_testing.py:220-223)
with a run-name convention ``{dataset}/{method}/{model}[/fine-tune|/test]``
(reference: train.py:44-59). wandb is not installed in this environment, so
this module provides a `Run` interface with the same logging surface:

  * uses wandb transparently when it is importable and ``WANDB_MODE`` is not
    ``disabled``;
  * otherwise appends JSON lines to ``<dir>/metrics.jsonl`` so runs remain
    fully observable offline, keeping the reference's metric key names
    (``Loss/train/batch/EDM`` etc.) so dashboards translate 1:1.
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path
from typing import Any

try:  # pragma: no cover - depends on environment
    import wandb as _wandb
except ImportError:
    _wandb = None


class JsonlRun:
    """File-backed stand-in for a wandb run."""

    def __init__(self, dir: str | Path = ".", name: str | None = None,
                 config: dict | None = None, **_: Any):
        self.dir = Path(dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.name = name or "run"
        self.id = f"{int(time.time())}"
        self.config = dict(config or {})
        self._fh = open(self.dir / "metrics.jsonl", "a")
        if self.config:
            self._write({"_type": "config", "config": _jsonable(self.config)})

    def _write(self, obj: dict) -> None:
        self._fh.write(json.dumps(obj) + "\n")
        self._fh.flush()

    def log(self, data: dict, step: int | None = None) -> None:
        rec = {"_t": time.time()}
        if step is not None:
            rec["_step"] = int(step)
        rec.update({k: _jsonable(v) for k, v in data.items()})
        self._write(rec)

    def log_artifact(self, *a, **k) -> None:  # parity no-op
        pass

    def finish(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()
        return False


def _jsonable(v: Any) -> Any:
    try:
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        if hasattr(v, "item"):
            try:
                return v.item()
            except Exception:
                pass
        if hasattr(v, "tolist"):
            try:
                return v.tolist()
            except Exception:
                pass
        return str(v)


def init(**kwargs) -> Any:
    """Start a run: wandb when available & enabled, JSONL otherwise.

    Accepts the same kwargs the reference passes to ``wandb.init``
    (entity, project, dir, name, mode, job_type, group, tags, config).
    """
    mode = kwargs.get("mode") or os.environ.get("WANDB_MODE", "online")
    if _wandb is not None and mode != "disabled":
        return _wandb.init(**kwargs)
    log_dir = Path(kwargs.get("dir") or ".") / "runs" / (
        (kwargs.get("name") or "run").replace("/", "-")
    )
    return JsonlRun(dir=log_dir, name=kwargs.get("name"),
                    config=kwargs.get("config"))


def log_model_artifact(run, name: str, paths, metadata: dict | None = None,
                       art_type: str = "model") -> None:
    """Upload checkpoints (art_type="model", reference
    training/training_loop.py:133-141) or datasets (art_type="dataset",
    reference notebooks/wandb_stuff.ipynb final cell) as a wandb
    artifact. Orbax checkpoints are directories, so ``add_dir`` replaces
    the reference's ``add_file``. With the JSONL fallback (or a disabled
    wandb run) the artifact is recorded as a log line carrying the paths
    instead."""
    paths = [Path(p) for p in paths]
    if _wandb is not None and getattr(run, "log_artifact", None) is not None \
            and not isinstance(run, JsonlRun):
        try:
            art = _wandb.Artifact(name=name, type=art_type,
                                  metadata=metadata or {})
            for p in paths:
                if p.is_dir():
                    art.add_dir(str(p), name=p.name)
                elif p.exists():
                    art.add_file(str(p))
            run.log_artifact(art)
            return
        except Exception as e:        # offline/disabled runs must not
            logging.getLogger(__name__).warning(   # fail training
                "wandb artifact upload failed: %s", e)
    if hasattr(run, "log"):
        run.log({"model_artifact": name,
                 "model_artifact_paths": [str(p) for p in paths],
                 **({"model_artifact_meta": metadata} if metadata else {})})


def run_metadata(dataset_name: str, method: str, model_name: str,
                 job_type: str, cfg_container: dict,
                 suffix: str | None = None) -> dict:
    """Build wandb kwargs with the reference's run-name convention
    (reference: train.py:44-59, test2.py:56-71)."""
    run_name = f"{dataset_name}/{method}/{model_name}"
    if suffix:
        run_name += f"/{suffix}"
    run_name = run_name.replace(" ", "-").replace("_", "-")
    config = dict(cfg_container)
    config["run_name"] = run_name
    return {
        "name": run_name,
        "job_type": job_type,
        "group": model_name,
        "tags": [dataset_name, model_name, job_type],
        "config": config,
    }
