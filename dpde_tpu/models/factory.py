"""Config-driven model/loss factories (reference: src/diffusion_pde/
utils.py:18-70)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..utils.paths import resolve_data_path
from .losses import EDMHeatLoss, EDMLoss
from .precond import Denoiser
from .unet import EDMUNet, SmallUnet


def build_net_from_config(cfg, remat: bool | None = None) -> Any:
    """Construct the flax module for cfg.model + cfg.dataset.net
    (reference utils.py:38-70). Returns the module (uninitialised).

    ``remat``: per-ResBlock rematerialisation (EDMUNet only). None reads
    ``cfg.model.remat`` (default False — the reference workloads fit HBM
    with the flat tile-aligned device-data layout, data/device_pipeline.py;
    set cfg.model.remat=true when batch/resolution outgrow the chip). The
    param pytree is identical either way, so checkpoints are
    interchangeable."""
    in_ch = cfg.dataset.net.in_ch
    label_ch = cfg.dataset.net.label_ch
    name = cfg.model.name.lower().replace(" ", "-").replace("_", "-")
    method = cfg.dataset.method
    if name == "unet-small":
        if method == "forward":
            raise ValueError(
                "unet-small is not compatible with 'forward' (needs obs)")
        return SmallUnet(chs=tuple(cfg.model.chs), label_dim=label_ch,
                         noise_ch=cfg.model.noise_ch)
    if name == "unet-v2":
        obs_ch = in_ch if method == "forward" else cfg.model.obs_ch
        dtype_name = cfg.model.get("dtype", "float32")
        dtype = {"float32": None, "bfloat16": jnp.bfloat16}[dtype_name]
        if remat is None:
            remat = bool(cfg.model.get("remat", False))
        return EDMUNet(
            img_channels=in_ch,
            label_dim=label_ch,
            obs_channels=obs_ch,
            base_channels=cfg.model.base_ch,
            channel_mults=tuple(cfg.model.ch_mults),
            num_res_blocks=cfg.model.n_res_blocks,
            dropout=cfg.model.dropout,
            sigma_emb_dim=cfg.model.noise_ch,
            emb_dim=cfg.model.emb_ch,
            dtype=dtype,
            remat=remat,
        )
    raise ValueError(f"Unknown model name: {cfg.model.name}")


def init_denoiser(cfg, key: jax.Array, sample_shape, num_channels: int,
                  remat: bool | None = None) -> tuple[Any, Denoiser]:
    """Initialise module params and bind the EDM-preconditioned denoiser.

    sample_shape: (H, W); num_channels: channels of x (in_ch).
    """
    module = build_net_from_config(cfg, remat=remat)
    h, w = sample_shape
    label_ch = cfg.dataset.net.label_ch
    obs_ch = getattr(module, "obs_channels", 0)
    x = jnp.zeros((1, h, w, num_channels), jnp.float32)
    sigma = jnp.ones((1,), jnp.float32)
    labels = jnp.zeros((1, label_ch), jnp.float32) if label_ch > 0 else None
    obs = jnp.zeros((1, h, w, obs_ch), jnp.float32) if obs_ch else None
    # initialise on the host CPU: weight init needs no accelerator, and a
    # full-UNet init program is an expensive pointless TPU compile
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = jax.jit(module.init, backend="cpu")(key, x, sigma, labels,
                                                     obs)
    params = jax.device_put(params, jax.devices()[0])

    def apply_fn(p, xx, ss, ll, oo, train=False, rngs=None):
        return module.apply(p, xx, ss, ll, oo, train=train, rngs=rngs)

    return module, Denoiser(apply_fn, params,
                            sigma_data=cfg.model.sigma_data)


def build_loss_from_config(cfg):
    """EDMLoss unless physics_loss, else EDMHeatLoss with dx from the
    dataset attrs (reference utils.py:18-35)."""
    if not cfg.dataset.training.physics_loss:
        return EDMLoss()
    from ..data.io import load_attr

    datapath = resolve_data_path(cfg.dataset.data.datapath)
    dx = float(load_attr(datapath, "dx"))
    return EDMHeatLoss(
        dx=dx,
        pde_loss_coeff=cfg.dataset.training.physics_loss_coeff,
        method=cfg.dataset.method,
        residual_estimation=cfg.dataset.residual_estimation,
    )
