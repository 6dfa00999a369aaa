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

# one jitted whole-tree copy (a per-leaf copy would trigger one tiny
# compile per parameter shape — minutes on a remote-compile tunnel)
_tree_copy = jax.jit(
    lambda t: jax.tree_util.tree_map(lambda x: x.copy(), t))


def _iterable_spec(it):
    """Map a host epoch iterator to a device_pipeline method string."""
    from ..data.datasets import (
        DiffusionForwardIterable,
        DiffusionIterable,
        NoTimeIterable,
    )

    if isinstance(it, DiffusionForwardIterable):
        return "forward"
    if isinstance(it, DiffusionIterable):
        return "joint"
    if isinstance(it, NoTimeIterable):
        return "no_time"
    return None


def _build_device_path(denoiser, loss_fn, tx, ema_cfg, train_iter,
                       val_iter, mesh):
    """Assemble the whole-epoch-on-device functions (data.device_pipeline)
    from the host iterators' backing arrays."""
    from ..data import device_pipeline as dp

    method = _iterable_spec(train_iter)
    start_at_t0 = getattr(train_iter, "start_at_t0", False)
    t_steps = getattr(train_iter, "t_steps",
                      np.arange(train_iter.data.shape[-1], dtype=np.float32))

    batch_fn = dp.make_batch_fn(method, start_at_t0)
    train_dd = dp.to_device_data(train_iter.data, t_steps,
                                 train_iter.labels)
    raw_step = make_train_step(denoiser, loss_fn, tx, ema_cfg, jit=False)
    epoch = dp.make_epoch_fn(raw_step, batch_fn, train_iter.n,
                             train_iter.batch_size, mesh=mesh)

    val = val_dd = None
    if val_iter is not None and _iterable_spec(val_iter) == method:
        val_dd = dp.to_device_data(val_iter.data, t_steps, val_iter.labels)
        raw_eval = make_eval_step(denoiser, loss_fn, jit=False)
        val_batch_fn = dp.make_batch_fn(
            method, getattr(val_iter, "start_at_t0", False))
        val = dp.make_val_fn(raw_eval, val_batch_fn, val_iter.n,
                             val_iter.batch_size)

    return {
        "epoch": epoch, "train_dd": train_dd,
        "val": val, "val_dd": val_dd,
        "n_batches": max(1, train_iter.n // min(train_iter.batch_size,
                                                train_iter.n)),
    }


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
    device_data: bool | str = "auto",
):
    """Run training; returns the final TrainState (host copy).

    ``device_data`` selects the whole-epoch-on-device fast path
    (data.device_pipeline): the dataset array is put in HBM once and each
    epoch is ONE jitted dispatch — no per-step host↔device transfers.
    "auto" uses it whenever the iterators expose their backing arrays and
    the dataset fits comfortably on a chip (< 8 GB).
    """
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

    dev = None
    if device_data == "auto":
        # the fused whole-epoch program is an accelerator win but an
        # XLA:CPU compile sink (tens of minutes at real model sizes for a
        # program the host then executes slowly anyway) — CPU runs are
        # tests/smoke only, so keep them on the per-step path
        device_data = (_iterable_spec(train_iter) is not None
                       and train_iter.data.nbytes < 8 * 2 ** 30
                       and jax.default_backend() != "cpu")
    if device_data:
        dev = _build_device_path(denoiser, loss_fn, tx, ema_cfg,
                                 train_iter, val_iter, mesh)
        logger.info("device-resident data pipeline: 1 dispatch/epoch, "
                    "%d train batches", dev["n_batches"])

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
        best_ema, best_dirty = None, False
        try:
            for epoch in range(start_epoch, epochs):
                t0 = time.perf_counter()
                if dev is not None:
                    key, k_ep = jax.random.split(key)
                    state, ep_loss, ep_aux = dev["epoch"](
                        state, k_ep, dev["train_dd"])
                    # one transfer for all epoch scalars (per-scalar
                    # float() would pay the host link latency each)
                    ep_loss, ep_aux = jax.device_get((ep_loss, ep_aux))
                    epoch_loss = float(ep_loss)
                    aux_mean = {k: float(v) for k, v in ep_aux.items()}
                else:
                    # keep per-step losses on device — a float() per step
                    # would force a host sync and serialize dispatch
                    losses, auxes, n_batches = [], [], 0
                    for batch in train_iter:
                        key, k_step = jax.random.split(key)
                        sb = shard_batch(mesh, batch)
                        state, loss, aux = train_step(
                            state, k_step, sb["X"], sb.get("labels"),
                            sb.get("obs"))
                        losses.append(loss)
                        auxes.append(aux)
                        n_batches += 1
                    epoch_loss = float(np.mean([float(l) for l in losses])) \
                        if losses else 0.0
                    # aux metrics averaged over the epoch's batches (the
                    # reference logs each batch, loss.py:164-169; one
                    # averaged point per epoch carries the same signal
                    # without per-step wandb traffic)
                    aux_mean = {
                        k: float(np.mean([float(a[k]) for a in auxes]))
                        for k in auxes[0]
                    } if auxes else {}
                step = int(state.step)
                run.log({"Loss/train/epoch": epoch_loss, "epoch": epoch,
                         **aux_mean},
                        step=step)
                logger.info("Epoch [%d/%d] - Loss: %.6f (%.1fs)",
                            epoch + 1, epochs, epoch_loss,
                            time.perf_counter() - t0)

                if val_interval is not None and (epoch + 1) % val_interval == 0:
                    if dev is not None:
                        key, k_val = jax.random.split(key)
                        val_loss = float(dev["val"](
                            state.ema_params, k_val, dev["val_dd"]))
                    else:
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
                        logger.info("  new best; retaining EMA on device")
                        # keep the best EMA ON DEVICE (one jitted tree
                        # copy, so the buffers survive the donated train
                        # state) and persist it only at checkpoint
                        # cadence: device->host readback can be orders of
                        # magnitude slower than HBM (tunneled setups), and
                        # early training improves at every val point
                        best_ema = _tree_copy(state.ema_params)
                        best_dirty = True

                if (checkpoint_interval is not None
                        and (epoch + 1) % checkpoint_interval == 0):
                    ckpt.save_params(f"model_epoch_{epoch + 1}", state.params)
                    ckpt.save_state("latest", {
                        "state": state, "epoch": epoch, "best_val": best_val,
                    })
                    if best_dirty and best_ema is not None:
                        ckpt.save_params("ema_model_best", best_ema)
                        best_dirty = False
            # normal completion: flush best-EMA, final saves, and the
            # wandb model artifact (reference training_loop.py:133-141 —
            # uploaded within the same run, before run.finish())
            if best_dirty and best_ema is not None:
                ckpt.save_params("ema_model_best", best_ema)
                best_dirty = False
            ckpt_final = CheckpointManager(save_dir)
            ckpt_final.save_params("model", state.params)
            ckpt_final.save_params("ema_model", state.ema_params)
            logger.info("training complete; model + ema_model saved to %s",
                        save_dir)
            art_name = str((wandb_kwargs or {}).get(
                "name", save_dir.name)).replace("/", "-")
            metrics_mod.log_model_artifact(
                run, art_name,
                [save_dir / "model", save_dir / "ema_model"],
                metadata={"save_dir": str(save_dir), "epochs": epochs})
        finally:
            run.finish() if hasattr(run, "finish") else None

    return state
