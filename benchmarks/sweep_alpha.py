"""Per-diffusivity (alpha) robustness sweep for guided heat sampling.

Reproduces the reference's figures/sampling_losses_mult_samples experiment
(BASELINE.md row 5: final combined loss ~3-5 across alpha in
{0.19 ... 1.60}): pick test items spanning the alpha range, run the
50-step guided JointSampler on each — items are flattened into ONE device
batch (per-item guidance sqrt-sums keep them exactly independent), one
compile total — and record each item's per-step loss traces.

    python benchmarks/sweep_alpha.py sampling_conf=heat_logt_joint \
        dataset=heat_eq_logt_joint observations.interior_a=0.2 \
        observations.boundary_a=0.2 '+sweep.n_alphas=5'
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
    pde_losses,
)
from dpde_tpu.training import load_pretrained_params  # noqa: E402
from dpde_tpu.utils import enable_compilation_cache, resolve_data_path  # noqa: E402
from dpde_tpu.utils.config import main as config_main  # noqa: E402

logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("sweep_alpha")


@config_main(config_path="conf", config_name="test")
def main(cfg):
    enable_compilation_cache()
    sc = cfg.sampling_conf
    sweep = cfg.get("sweep", {}) or {}
    n_alphas = int(sweep.get("n_alphas", 5))
    seed = int(sweep.get("seed", 0))

    view = get_validation_view(sc.test_data_path, time_as_label=True,
                               include_t0_as_target=False)
    mask_a, mask_u = get_masks_from_config(
        cfg, rng=np.random.default_rng(seed))

    key = jax.random.PRNGKey(seed)
    _, den = init_denoiser(cfg, key, tuple(sc.sample_shape),
                           cfg.dataset.net.in_ch)
    den = den.replace_params(load_pretrained_params(
        resolve_data_path(sc.pretrained_path), den.params))

    dx = float(load_attr(resolve_data_path(sc.test_data_path), "dx"))

    # pick items whose alpha (static label) spans the dataset range
    alphas = view.labels[:, -1]
    targets = np.quantile(alphas, np.linspace(0.02, 0.98, n_alphas))
    picks = sorted({int(np.abs(alphas - t).argmin()) for t in targets})
    logger.info("items %s with alpha %s", picks,
                np.round(alphas[picks], 3).tolist())

    s = sc.batch_size
    c = sc.num_channels
    ch_a = c // 2
    k = len(picks)
    rep = lambda x: np.repeat(x[picks], s, axis=0)
    labels = rep(view.labels) if view.labels is not None else None
    # ValidationView stores (N, H, W, C) channel-last items
    obs_a = rep(view.a[..., :ch_a])
    obs_u = rep(view.u[..., :c - ch_a])

    sampler = JointSampler(
        den, tuple(sc.sample_shape), c, s, ch_a=ch_a,
        loss_fn=pde_losses.heat_loss2, loss_kwargs={"dx": dx},
        num_steps=int(sc.num_steps), sigma_min=sc.sigma_min,
        sigma_max=sc.sigma_max, rho=sc.rho,
        out_and_grad_fn=net_and_dnet_dt)

    t0 = time.perf_counter()
    _, losses = sampler.sample(
        jax.random.PRNGKey(seed), labels, obs_a, obs_u, mask_a, mask_u,
        sc.zeta_a, sc.zeta_u, sc.zeta_pde, return_losses=True)
    dt = time.perf_counter() - t0
    losses = np.asarray(losses)                    # (steps, K, 4)
    if losses.ndim == 2:
        losses = losses[:, None, :]

    results = {}
    for j, item in enumerate(picks):
        a = float(alphas[item])
        results[f"{a:.4g}"] = {
            "item": item,
            "loss_a": losses[:, j, 0].tolist(),
            "loss_u": losses[:, j, 1].tolist(),
            "loss_pde": losses[:, j, 2].tolist(),
            "combined": losses[:, j, 3].tolist(),
            "final_combined": float(losses[-1, j, 3]),
        }
        logger.info("alpha=%.3g final combined loss %.4g", a,
                    losses[-1, j, 3])
    logger.info("%d items x %d samples in %.1fs (one batch)", k, s, dt)

    out_dir = Path(cfg.run.dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "sampling_losses_mult_samples.json"
    out_path.write_text(json.dumps(results, indent=2))
    logger.info("wrote %s", out_path)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        for a_str, r in results.items():
            ax.plot(r["combined"], label=f"alpha={a_str}")
        ax.set_yscale("log")
        ax.set_xlabel("sampler step")
        ax.set_ylabel("combined guidance loss")
        ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig(out_dir / "sampling_losses_mult_samples.png", dpi=120)
        logger.info("wrote %s", out_dir / "sampling_losses_mult_samples.png")
    except Exception as e:
        logger.info("figure skipped: %s", e)

    return results


if __name__ == "__main__":
    main()
