"""Unconditional sampling from a trained model (notebook-equivalent of the
reference's 01_heat_model.ipynb demo path: train, then 50-step Karras/Heun
sampling with no guidance — reference UnconditionalSampler,
sample.py:145-239; BASELINE.json configs[0]).

    python tools/sample_unconditional.py sampling_conf=heat_logt_joint \
        dataset=heat_eq_logt_joint '+sample.n=16' '+sample.tau=0.25'

Writes samples.npz (+ a grid figure when matplotlib is available) under
cfg.run.dir.
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from dpde_tpu.models import init_denoiser  # noqa: E402
from dpde_tpu.sampling import UnconditionalSampler  # noqa: E402
from dpde_tpu.training import load_pretrained_params  # noqa: E402
from dpde_tpu.utils import enable_compilation_cache, resolve_data_path  # noqa: E402
from dpde_tpu.utils.config import main as config_main  # noqa: E402

logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("sample_unconditional")


@config_main(config_path="conf", config_name="test")
def main(cfg):
    enable_compilation_cache()
    sc = cfg.sampling_conf
    opts = cfg.get("sample", {}) or {}
    n = int(opts.get("n", 16))
    tau = float(opts.get("tau", 0.25))
    alpha = float(opts.get("alpha", 1.0))
    seed = int(opts.get("seed", 0))

    key = jax.random.PRNGKey(seed)
    _, den = init_denoiser(cfg, key, tuple(sc.sample_shape),
                           cfg.dataset.net.in_ch)
    den = den.replace_params(load_pretrained_params(
        resolve_data_path(sc.pretrained_path), den.params))

    c = sc.num_channels
    label_ch = cfg.dataset.net.label_ch
    labels = None
    if label_ch:
        lab = np.zeros((n, label_ch), np.float32)
        lab[:, 0] = tau          # time gap
        if label_ch > 1:
            lab[:, -1] = alpha   # static label (heat: diffusivity)
        labels = lab

    sampler = UnconditionalSampler(
        den, tuple(sc.sample_shape), c, n,
        num_steps=int(sc.num_steps), sigma_min=sc.sigma_min,
        sigma_max=sc.sigma_max, rho=sc.rho)
    t0 = time.perf_counter()
    x = np.asarray(sampler.sample(jax.random.PRNGKey(seed + 1), labels))
    logger.info("sampled %s in %.1fs (compile+run)", x.shape,
                time.perf_counter() - t0)

    out_dir = Path(cfg.run.dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez(out_dir / "unconditional_samples.npz", samples=x,
             labels=labels if labels is not None else np.zeros(0))
    logger.info("wrote %s", out_dir / "unconditional_samples.npz")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        cols = min(8, n)
        rows = (n + cols - 1) // cols
        fig, axes = plt.subplots(rows, 2 * cols,
                                 figsize=(2 * cols * 1.6, rows * 1.6))
        axes = np.atleast_2d(axes)
        for i in range(n):
            r, col = divmod(i, cols)
            for ch in range(min(2, c)):
                ax = axes[r, 2 * col + ch]
                ax.imshow(x[i, :, :, ch], cmap="viridis")
                ax.set_axis_off()
                if r == 0:
                    ax.set_title(f"ch{ch}", fontsize=7)
        fig.suptitle(f"unconditional samples (tau={tau}, alpha={alpha})")
        fig.tight_layout()
        fig.savefig(out_dir / "unconditional_samples.png", dpi=110)
        logger.info("wrote %s", out_dir / "unconditional_samples.png")
    except Exception as e:
        logger.info("figure skipped: %s", e)


if __name__ == "__main__":
    main()
