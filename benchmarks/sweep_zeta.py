"""Guidance-weight (zeta) sensitivity sweep.

Reproduces the reference's figures/sampling_losses_zeta_sensitivity
experiment (BASELINE.md row 4): run the 50-step guided JointSampler with
the observation weights scaled by a set of multipliers around the tuned
values and record the per-step loss traces. Expected regimes (reference
figures/sampling_losses_num_steps_sensitivity_{too_low,just_right,
too_large}.png):

  * too low  (x0.1): obs losses plateau high (~80/40 in the reference);
  * just right (x1): obs losses -> 0 by the final step;
  * too high (x10):  oscillation, collapse after the 0.8*N weight drop.

    python benchmarks/sweep_zeta.py sampling_conf=heat_logt_joint \
        dataset=heat_eq_logt_joint observations.interior_a=0.2 \
        observations.boundary_a=0.2 '+sweep.scales=[0.1,1.0,10.0]'
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from dpde_tpu.data import get_validation_view  # noqa: E402
from dpde_tpu.data.io import load_attr  # noqa: E402
from dpde_tpu.eval import get_masks_from_config  # noqa: E402
from dpde_tpu.models import init_denoiser  # noqa: E402
from dpde_tpu.sampling import (  # noqa: E402
    JointSampler,
    net_and_dnet_dt,
    net_and_dnet_dt_dummy,
    pde_losses,
)
from dpde_tpu.training import load_pretrained_params  # noqa: E402
from dpde_tpu.utils import enable_compilation_cache, resolve_data_path  # noqa: E402
from dpde_tpu.utils.config import main as config_main  # noqa: E402

logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("sweep_zeta")


@config_main(config_path="conf", config_name="test")
def main(cfg):
    enable_compilation_cache()
    sc = cfg.sampling_conf
    sweep = cfg.get("sweep", {}) or {}
    scales = [float(s) for s in sweep.get("scales", [0.1, 1.0, 10.0])]
    seed = int(sweep.get("seed", 0))

    dataset_name = cfg.dataset.data.name.lower()
    time_as_label = not ("no_cond" in dataset_name
                         or "no_time" in dataset_name)
    view = get_validation_view(sc.test_data_path,
                               time_as_label=time_as_label,
                               include_t0_as_target=False)
    mask_a, mask_u = get_masks_from_config(
        cfg, rng=np.random.default_rng(seed))

    key = jax.random.PRNGKey(seed)
    _, den = init_denoiser(cfg, key, tuple(sc.sample_shape),
                           cfg.dataset.net.in_ch)
    den = den.replace_params(load_pretrained_params(
        resolve_data_path(sc.pretrained_path), den.params))

    if "heat" in dataset_name:
        dx = float(load_attr(resolve_data_path(sc.test_data_path), "dx"))
        loss_fn, kw, oag = pde_losses.heat_loss2, {"dx": dx}, net_and_dnet_dt
    else:
        loss_fn, kw, oag = pde_losses.llg_loss2, {}, net_and_dnet_dt_dummy

    item = int(sweep.get("item", min(len(view), 1000) // 2))
    batch = next(view.subset([item]).batches(1))
    s = sc.batch_size
    c = sc.num_channels
    ch_a = c // 2
    rep = lambda x: np.repeat(x, s, axis=0) if x is not None else None
    labels = rep(batch["labels"])
    obs_a = rep(batch["A"][..., :ch_a])
    obs_u = rep(batch["U"][..., :c - ch_a])

    # one sampler/compile reused across scales (zetas are traced args)
    sampler = JointSampler(
        den, tuple(sc.sample_shape), c, s, ch_a=ch_a,
        loss_fn=loss_fn, loss_kwargs=kw, num_steps=int(sc.num_steps),
        sigma_min=sc.sigma_min, sigma_max=sc.sigma_max, rho=sc.rho,
        out_and_grad_fn=oag)

    results = {}
    for scale in scales:
        t0 = time.perf_counter()
        _, losses = sampler.sample(
            jax.random.PRNGKey(seed), labels, obs_a, obs_u,
            mask_a, mask_u, scale * sc.zeta_a, scale * sc.zeta_u,
            sc.zeta_pde, return_losses=True)
        dt = time.perf_counter() - t0
        results[str(scale)] = {
            "zeta_a": scale * sc.zeta_a, "zeta_u": scale * sc.zeta_u,
            "zeta_pde": sc.zeta_pde,
            "loss_a": losses[:, 0].tolist(),
            "loss_u": losses[:, 1].tolist(),
            "loss_pde": losses[:, 2].tolist(),
            "combined": losses[:, 3].tolist(),
            "final": dict(zip(["loss_a", "loss_u", "loss_pde", "combined"],
                              losses[-1].tolist())),
            "wall_s": dt,
        }
        logger.info("scale=%g final losses: a=%.4g u=%.4g pde=%.4g (%.1fs)",
                    scale, *losses[-1, :3], dt)

    out_dir = Path(cfg.run.dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "sampling_losses_zeta_sensitivity.json"
    out_path.write_text(json.dumps(results, indent=2))
    logger.info("wrote %s", out_path)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 4, figsize=(16, 3.2))
        names = ["loss_a", "loss_u", "loss_pde", "combined"]
        for ax, nm in zip(axes, names):
            for scale in scales:
                tr = results[str(scale)][nm]
                ax.plot(np.linspace(0, 1, len(tr)), tr,
                        label=f"zeta x{scale:g}")
                ax.axhline(tr[-1], ls="--", lw=0.5)
            ax.set_title(nm)
            ax.set_yscale("log")
            ax.legend(fontsize=7)
        fig.suptitle("Guided sampling losses vs zeta scale "
                     f"({sc.num_steps} steps)")
        fig.tight_layout()
        fig_path = out_dir / "sampling_losses_zeta_sensitivity.png"
        fig.savefig(fig_path, dpi=120)
        logger.info("wrote %s", fig_path)
    except Exception as e:  # matplotlib optional
        logger.info("figure skipped: %s", e)

    return results


if __name__ == "__main__":
    main()
