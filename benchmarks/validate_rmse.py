"""Guided-sampling RMSE-over-time validation.

Script equivalent of the reference's 02_validation.ipynb: generate fresh
heat trajectories with the exact DST solver, run the guided JointSampler
against sparse observations at several target times, and report RMSE of
the reconstructed fields vs the exact solution (with NaN guards, as the
notebook's cell 13 abort).

    python benchmarks/validate_rmse.py sampling_conf=heat_logt_joint \
        dataset=heat_eq_lineart_joint +validate.n_items=4
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dpde_tpu.eval import get_masks_from_config  # noqa: E402
from dpde_tpu.models import init_denoiser  # noqa: E402
from dpde_tpu.physics import heat as heat_phys  # noqa: E402
from dpde_tpu.sampling import (  # noqa: E402
    JointSampler,
    net_and_dnet_dt,
    pde_losses,
)
from dpde_tpu.training import load_pretrained_params  # noqa: E402
from dpde_tpu.utils import enable_compilation_cache, resolve_data_path  # noqa: E402
from dpde_tpu.utils.config import main as config_main  # noqa: E402

logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("validate_rmse")


@config_main(config_path="conf", config_name="test")
def main(cfg):
    enable_compilation_cache()
    sc = cfg.sampling_conf
    val = cfg.get("validate", {}) or {}
    n_items = int(val.get("n_items", 4))
    seed = int(val.get("seed", 0))
    s_grid = int(sc.sample_shape[0])

    # fresh exact trajectories
    steps = 16
    dt = np.diff(heat_phys.time_grid(steps, 0.5))
    u, a, t_steps, labels_np = heat_phys.generate_heat(
        jax.random.PRNGKey(seed + 123), n=n_items, batch=n_items,
        s=s_grid, steps=steps, dt=dt)

    key = jax.random.PRNGKey(seed)
    _, den = init_denoiser(cfg, key, tuple(sc.sample_shape),
                           cfg.dataset.net.in_ch)
    den = den.replace_params(load_pretrained_params(
        resolve_data_path(sc.pretrained_path), den.params))

    mask_a, mask_u = get_masks_from_config(
        cfg, rng=np.random.default_rng(seed))
    dx = 1.0 / (s_grid - 1)
    n_samp = sc.batch_size
    sampler = JointSampler(
        den, tuple(sc.sample_shape), sc.num_channels, n_samp,
        ch_a=sc.num_channels // 2, loss_fn=pde_losses.heat_loss2,
        loss_kwargs={"dx": dx}, num_steps=sc.num_steps,
        sigma_min=sc.sigma_min, sigma_max=sc.sigma_max, rho=sc.rho,
        out_and_grad_fn=net_and_dnet_dt)

    results = []
    t_indices = [steps // 4, steps // 2, steps]
    for item in range(n_items):
        for t_idx in t_indices:
            a_i = np.moveaxis(u[item:item + 1, :, :, :, 0], 1, -1)
            u_i = np.moveaxis(u[item:item + 1, :, :, :, t_idx], 1, -1)
            tau = float(t_steps[t_idx] - t_steps[0])
            lab = jnp.asarray(
                [[tau, float(labels_np[item, 0])]] * n_samp)
            key, k_s = jax.random.split(key)
            samples, _ = sampler.sample(
                k_s, lab, np.repeat(a_i, n_samp, 0),
                np.repeat(u_i, n_samp, 0), mask_a, mask_u,
                sc.zeta_a, sc.zeta_u, sc.zeta_pde)
            smp = np.asarray(samples)
            if not np.isfinite(smp).all():
                logger.error("NaN in samples (item %d t %d) — aborting "
                             "item", item, t_idx)
                continue
            mean = smp.mean(axis=0)
            truth = np.concatenate([a_i[0], u_i[0]], axis=-1)
            rmse = float(np.sqrt(((mean - truth) ** 2).mean()))
            rng_t = truth.max() - truth.min()
            results.append({"item": item, "t_idx": int(t_idx),
                            "tau": float(tau), "rmse": rmse,
                            "rel_rmse": float(rmse / max(rng_t, 1e-9))})
            logger.info("item %d t=%.3f: rmse %.4f (rel %.4f)",
                        item, tau, rmse, results[-1]["rel_rmse"])

    out_dir = Path(cfg.run.dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "validate_rmse.json").write_text(json.dumps(results,
                                                           indent=2))
    if results:
        rel = [r["rel_rmse"] for r in results]
        logger.info("mean rel RMSE over %d runs: %.4f", len(rel),
                    float(np.mean(rel)))


if __name__ == "__main__":
    main()
