"""Evaluation entry point (reference: test2.py — the *working* test script;
the reference's test.py is stale, SURVEY.md L8 note).

    python test.py sampling_conf=heat_logt_joint dataset=heat_eq_logt_joint \
        observations.interior_a=0.2
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import numpy as np

from dpde_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dpde_tpu.data import get_validation_view
from dpde_tpu.data.io import load_attr
from dpde_tpu.eval import get_masks_from_config, test_loop
from dpde_tpu.models import init_denoiser
from dpde_tpu.sampling import (
    JointSampler,
    net_and_dnet_dt,
    net_and_dnet_dt_dummy,
    pde_losses,
)
from dpde_tpu.training import load_pretrained_params
from dpde_tpu.utils import metrics as metrics_mod, resolve_data_path
from dpde_tpu.utils.config import main as config_main

logging.basicConfig(level=logging.INFO, force=True,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("test")


@config_main(config_path="conf", config_name="test")
def main(cfg):
    dataset_name = cfg.dataset.data.name.lower()
    method = cfg.dataset.method.lower()
    model_name = cfg.model.name.lower()
    sc = cfg.sampling_conf

    time_as_label = not ("no_cond" in dataset_name
                         or "no_time" in dataset_name)
    include_t0 = cfg.dataset.data.get("include_t0_as_target", False)

    view = get_validation_view(sc.test_data_path,
                               time_as_label=time_as_label,
                               include_t0_as_target=include_t0)
    # +run.item_stride=N evaluates every N-th view row (spread over the
    # trajectory x time expansion) instead of the sequential prefix the
    # reference walks (model_testing.py:188) — the prefix is the earliest
    # times of the first trajectories only
    stride = int(cfg.run.get("item_stride", 1) or 1)
    if stride > 1:
        view = view.subset(np.arange(0, len(view), stride))
    mask_a, mask_u = get_masks_from_config(
        cfg, rng=np.random.default_rng(cfg.run.seed))

    key = jax.random.PRNGKey(cfg.run.seed)
    _, denoiser = init_denoiser(cfg, key, tuple(sc.sample_shape),
                                cfg.dataset.net.in_ch)
    pretrained = resolve_data_path(sc.pretrained_path)
    logger.info("loading pretrained model from %s", pretrained)
    denoiser = denoiser.replace_params(
        load_pretrained_params(pretrained, denoiser.params))

    # PDE dispatch (reference test2.py:83-95)
    if "heat" in dataset_name:
        dx = float(load_attr(resolve_data_path(sc.test_data_path), "dx"))
        loss_fn, loss_kwargs = pde_losses.heat_loss2, {"dx": dx}
        out_and_grad = net_and_dnet_dt
    elif "llg" in dataset_name:
        if cfg.run.get("llg_full_physics", False):
            # full LLG residual guidance — the capability the reference
            # could only reach by calling MagTense per sampling step
            # (reference pde_losses.py:119-257); here fully on-device
            from dpde_tpu.physics import llg as llg_phys
            from dpde_tpu.physics.demag import DemagKernel

            res, grid = llg_phys.STD4_RES, llg_phys.STD4_GRID
            params_phys = llg_phys.LLGParams()
            kernel = DemagKernel.build(res[0], res[1],
                                       grid[0] / res[0], grid[1] / res[1],
                                       grid[2])
            loss_fn = pde_losses.llg_residual_loss
            loss_kwargs = {"kernel": kernel, "params": params_phys}
            out_and_grad = net_and_dnet_dt
        else:
            loss_fn, loss_kwargs = pde_losses.llg_loss2, {}
            out_and_grad = net_and_dnet_dt_dummy
    else:
        raise ValueError(f"Unknown dataset name: {dataset_name}")

    sampler = JointSampler(
        net=denoiser,
        sample_shape=tuple(sc.sample_shape),
        num_channels=sc.num_channels,
        num_samples=sc.batch_size,
        ch_a=sc.num_channels // 2,
        loss_fn=loss_fn,
        loss_kwargs=loss_kwargs,
        num_steps=sc.num_steps,
        sigma_min=sc.sigma_min,
        sigma_max=sc.sigma_max,
        rho=sc.rho,
        out_and_grad_fn=out_and_grad,
    )

    wandb_kwargs = dict(cfg.wandb)
    wandb_kwargs.update(metrics_mod.run_metadata(
        dataset_name, method, model_name, "test", cfg.to_dict(),
        suffix="test"))

    # data-parallel sampling: shard the item x sample batch over all
    # available devices (single-chip here degenerates to one shard; on a
    # v5e-8 pod slice each chip carries items_per_batch*batch_size/8 rows)
    from dpde_tpu.parallel import make_mesh

    mesh = make_mesh()

    save_dir = Path(cfg.run.dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    return test_loop(
        sampler=sampler,
        validation_view=view,
        zeta_a=sc.zeta_a,
        zeta_u=sc.zeta_u,
        zeta_pde=sc.zeta_pde,
        wandb_kwargs=wandb_kwargs,
        mask_a=mask_a,
        mask_u=mask_u,
        max_num_samples=sc.max_num_samples,
        items_per_batch=cfg.run.items_per_batch,
        seed=cfg.run.seed,
        save_path=save_dir / "validation_data.npz",
        mesh=mesh,
    )


if __name__ == "__main__":
    main()
