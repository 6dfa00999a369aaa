"""Training entry point (reference: train.py).

Usage mirrors the reference Hydra CLI:

    python train.py dataset=heat_eq_logt_joint model=unetv2 \
        dataset.training.batch_size=64
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax

from dpde_tpu.data import get_dataloaders

from dpde_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
from dpde_tpu.models import build_loss_from_config, init_denoiser
from dpde_tpu.training import train as run_train
from dpde_tpu.utils import metrics as metrics_mod
from dpde_tpu.utils.config import main as config_main

logging.basicConfig(level=logging.INFO, force=True,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("train")


def build_and_train(cfg, *, pretrained_path: str | None = None,
                    run_suffix: str | None = None):
    """Shared body for train.py and fine_tune.py (reference train.py:11-86,
    fine_tune.py:12-103)."""
    dataset_name = cfg.dataset.data.name.lower()
    method = cfg.dataset.method
    model_name = cfg.model.name.lower()
    tr = cfg.dataset.training

    train_iter, val_iter = get_dataloaders(cfg, seed=cfg.run.seed)

    # infer spatial shape from one batch
    probe = next(iter(train_iter))
    h, w = probe["X"].shape[1], probe["X"].shape[2]
    num_channels = probe["X"].shape[-1]
    if method == "forward":
        num_channels = cfg.dataset.net.in_ch

    key = jax.random.PRNGKey(cfg.run.seed)
    _, denoiser = init_denoiser(cfg, key, (h, w), cfg.dataset.net.in_ch)

    if pretrained_path is not None:
        from dpde_tpu.training import load_pretrained_params

        logger.info("loading pretrained weights from %s", pretrained_path)
        try:
            denoiser = denoiser.replace_params(
                load_pretrained_params(pretrained_path, denoiser.params))
        except Exception:
            # cross-architecture warm start (e.g. 2ch heat -> 6ch LLG,
            # BASELINE.json configs[3]): take every leaf whose path and
            # shape match, keep fresh init for the rest
            params, report = load_pretrained_params(
                pretrained_path, denoiser.params, partial=True)
            logger.info(
                "partial warm start: %d leaves loaded, %d kept at init "
                "(shape/arch mismatch): %s", len(report["loaded"]),
                len(report["skipped"]), report["skipped"][:8])
            if not report["loaded"]:
                raise
            denoiser = denoiser.replace_params(params)

    loss_fn = build_loss_from_config(cfg)

    wandb_kwargs = dict(cfg.wandb.to_dict()) if hasattr(cfg.wandb, "to_dict") \
        else dict(cfg.wandb)
    wandb_kwargs.update(metrics_mod.run_metadata(
        dataset_name, method, model_name, "train", cfg.to_dict(),
        suffix=run_suffix))

    save_dir = Path(cfg.run.dir) / f"{dataset_name}_{method}_{model_name}"
    state = run_train(
        denoiser,
        train_iter,
        val_iter,
        loss_fn,
        epochs=tr.num_epochs,
        lr=tr.learning_rate,
        weight_decay=tr.weight_decay,
        grad_clip=tr.gradient_clipping,
        val_interval=tr.val_interval,
        ema_decay=tr.ema_decay,
        ema_warmup=tr.ema_warmup,
        ema_update_interval=tr.ema_update_interval,
        checkpoint_interval=tr.checkpoint_interval,
        save_dir=save_dir,
        wandb_kwargs=wandb_kwargs,
        seed=cfg.run.seed,
    )
    return state


@config_main(config_path="conf", config_name="train")
def main(cfg):
    return build_and_train(cfg)


if __name__ == "__main__":
    main()
