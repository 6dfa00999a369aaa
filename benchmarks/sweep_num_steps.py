"""Sampling-loss sensitivity sweep: loss curves vs num_steps.

Reproduces the reference's figures/sampling_losses_num_steps_sensitivity
experiment (BASELINE.md: final PDE-residual loss ~5.3e-2 @ 30 steps down
to ~5.0e-2 @ 200-300 steps; obs losses drop ~50x over the run) as a
scripted benchmark: runs the guided JointSampler at each step count,
records the per-step (loss_a, loss_u, loss_pde, combined) traces, and
writes JSON + optional matplotlib figure.

    python benchmarks/sweep_num_steps.py sampling_conf=heat_logt_joint \
        dataset=heat_eq_logt_joint +sweep.steps=[20,50,200]
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
logger = logging.getLogger("sweep_num_steps")


@config_main(config_path="conf", config_name="test")
def main(cfg):
    enable_compilation_cache()
    sc = cfg.sampling_conf
    sweep = cfg.get("sweep", {}) or {}
    step_counts = [int(s) for s in sweep.get("steps", [20, 50, 200])]
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

    # default item: middle of the reference's 1000-row eval domain — row 0
    # is trajectory 0 at the earliest time step, a systematically
    # unrepresentative corner (see bench.py item-selection note)
    item = int(sweep.get("item", min(len(view), 1000) // 2))
    batch = next(view.subset([item]).batches(1))
    s = sc.batch_size
    c = sc.num_channels
    ch_a = c // 2
    rep = lambda x: np.repeat(x, s, axis=0) if x is not None else None
    labels = rep(batch["labels"])
    obs_a = rep(batch["A"][..., :ch_a])
    obs_u = rep(batch["U"][..., :c - ch_a])

    results = {}
    for n in step_counts:
        sampler = JointSampler(
            den, tuple(sc.sample_shape), c, s, ch_a=ch_a,
            loss_fn=loss_fn, loss_kwargs=kw, num_steps=n,
            sigma_min=sc.sigma_min, sigma_max=sc.sigma_max, rho=sc.rho,
            out_and_grad_fn=oag)
        t0 = time.perf_counter()
        _, losses = sampler.sample(
            jax.random.PRNGKey(seed + n), labels, obs_a, obs_u,
            mask_a, mask_u, sc.zeta_a, sc.zeta_u, sc.zeta_pde,
            return_losses=True)
        dt = time.perf_counter() - t0
        results[str(n)] = {
            "loss_a": losses[:, 0].tolist(),
            "loss_u": losses[:, 1].tolist(),
            "loss_pde": losses[:, 2].tolist(),
            "combined": losses[:, 3].tolist(),
            "final": dict(zip(["loss_a", "loss_u", "loss_pde", "combined"],
                              losses[-1].tolist())),
            "wall_s": dt,
        }
        logger.info("steps=%d final losses: a=%.4g u=%.4g pde=%.4g (%.1fs)",
                    n, *losses[-1, :3], dt)

    out_dir = Path(cfg.run.dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "sampling_losses_num_steps_sensitivity.json"
    out_path.write_text(json.dumps(results, indent=2))
    logger.info("wrote %s", out_path)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 4, figsize=(16, 3.2))
        names = ["loss_a", "loss_u", "loss_pde", "combined"]
        for ax, nm in zip(axes, names):
            for n in step_counts:
                tr = results[str(n)][nm]
                ax.plot(np.linspace(0, 1, len(tr)), tr, label=f"{n} steps")
                ax.axhline(tr[-1], ls="--", lw=0.5)
            ax.set_title(nm)
            ax.set_yscale("log")
            ax.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(out_dir / "sampling_losses_num_steps_sensitivity.png",
                    dpi=120)
        logger.info("wrote figure")
    except Exception as e:  # pragma: no cover
        logger.warning("figure skipped: %s", e)


if __name__ == "__main__":
    main()
