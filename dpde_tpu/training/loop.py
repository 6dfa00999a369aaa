"""Epoch-level training driver.

Mirrors the reference train() semantics (reference:
src/diffusion_pde/training/training_loop.py:10-141): epoch loop, per-batch
loss/step, EMA update, validation every ``val_interval`` epochs with the
EMA weights, best-EMA checkpoint, periodic checkpoints, final model + EMA
save — plus what the reference lacks: true resume from the latest full
train-state checkpoint and a data-parallel mesh.

Metric key names match the reference so dashboards translate:
``Loss/train/batch/*`` (per batch), ``Loss/train/epoch``, ``Loss/val``.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Callable

import jax
import numpy as np

from ..models.ema import EMAConfig
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils import metrics as metrics_mod
from .checkpoint import CheckpointManager
from .state import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

logger = logging.getLogger(__name__)


def train(
    denoiser,                       # Denoiser with init params bound
    train_iter,                     # epoch iterable of batch dicts
    val_iter,                       # epoch iterable for validation
    loss_fn: Callable,
    *,
    epochs: int,
    lr: float,
    weight_decay: float = 0.0,
    grad_clip: float | None = None,
    val_interval: int | None = None,
    ema_decay: float | None = 0.999,
    ema_warmup: int = 0,
    ema_update_interval: int = 1,
    checkpoint_interval: int | None = None,
    save_dir: str | Path = ".",
    wandb_kwargs: dict | None = None,
    seed: int = 0,
    mesh=None,
    resume: bool = True,
):
    """Run training; returns the final TrainState (host copy)."""
    save_dir = Path(save_dir)
    ckpt = CheckpointManager(save_dir / "checkpoints")
    mesh = mesh or make_mesh()
    logger.info("training on mesh %s", mesh)

    tx = make_optimizer(lr, weight_decay, grad_clip)
    ema_cfg = EMAConfig(
        decay=ema_decay if ema_decay is not None else 1.0,
        warmup_steps=ema_warmup,
        update_every=ema_update_interval,
    )
    train_step = make_train_step(denoiser, loss_fn, tx, ema_cfg)
    eval_step = make_eval_step(denoiser, loss_fn)

    state = init_train_state(denoiser.params, tx)
    start_epoch = 0
    best_val = float("inf")
    if resume and ckpt.has("latest"):
        restored = ckpt.restore_state(
            "latest",
            {"state": state, "epoch": 0, "best_val": best_val},
        )
        state, start_epoch = restored["state"], int(restored["epoch"]) + 1
        best_val = float(restored["best_val"])
        logger.info("resumed from epoch %d (step %d)", start_epoch,
                    int(state.step))

    with mesh:
        state = TrainState(*replicate(mesh, tuple(state)))

        run = metrics_mod.init(**(wandb_kwargs or {}))
        key = jax.random.PRNGKey(seed)
        try:
            for epoch in range(start_epoch, epochs):
                t0 = time.perf_counter()
                # keep per-step losses on device — a float() per step would
                # force a host sync and serialize dispatch with compute
                losses, n_batches = [], 0
                for batch in train_iter:
                    key, k_step = jax.random.split(key)
                    sb = shard_batch(mesh, batch)
                    state, loss, aux = train_step(
                        state, k_step, sb["X"], sb.get("labels"),
                        sb.get("obs"))
                    losses.append(loss)
                    n_batches += 1
                epoch_loss = float(np.mean([float(l) for l in losses])) \
                    if losses else 0.0
                step = int(state.step)
                run.log({"Loss/train/epoch": epoch_loss, "epoch": epoch,
                         **{k: float(v) for k, v in aux.items()}},
                        step=step)
                logger.info("Epoch [%d/%d] - Loss: %.6f (%.1fs)",
                            epoch + 1, epochs, epoch_loss,
                            time.perf_counter() - t0)

                if val_interval is not None and (epoch + 1) % val_interval == 0:
                    val_running, vb = 0.0, 0
                    for batch in val_iter:
                        key, k_val = jax.random.split(key)
                        sb = shard_batch(mesh, batch)
                        val_running += float(eval_step(
                            state.ema_params, k_val, sb["X"],
                            sb.get("labels"), sb.get("obs")))
                        vb += 1
                    val_loss = val_running / max(1, vb)
                    run.log({"Loss/val": val_loss, "epoch": epoch},
                            step=step)
                    logger.info("  Validation Loss: %.6f", val_loss)
                    if val_loss < best_val:
                        best_val = val_loss
                        logger.info("  new best; saving EMA model")
                        ckpt.save_params("ema_model_best", state.ema_params)

                if (checkpoint_interval is not None
                        and (epoch + 1) % checkpoint_interval == 0):
                    ckpt.save_params(f"model_epoch_{epoch + 1}", state.params)
                    ckpt.save_state("latest", {
                        "state": state, "epoch": epoch, "best_val": best_val,
                    })
        finally:
            run.finish() if hasattr(run, "finish") else None

    ckpt_final = CheckpointManager(save_dir)
    ckpt_final.save_params("model", state.params)
    ckpt_final.save_params("ema_model", state.ema_params)
    logger.info("training complete; model + ema_model saved to %s", save_dir)
    return state
