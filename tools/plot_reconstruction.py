"""Qualitative reconstruction figure (reference figures/sampling_50_steps
.png family: ground truth vs guided reconstruction vs relative-error map,
BASELINE.md row "relative MAE <~2.5% interior, up to ~18% at corners").

Reuses the bench program shape (4 items x 32 samples flattened, fp32,
remat=False) so a warm cache makes this a ~1 min run:

    python tools/plot_reconstruction.py            # 50 steps, tuned zetas
    PLOT_STEPS=20 ZETAS=20,0.5,0.2 python tools/plot_reconstruction.py

Writes benchmarks/results/reconstruction_{steps}_steps.png (+ .npz).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dpde_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402


def main():
    from bench import CKPT, TEST_DATA, _build_denoiser, _ensure_test_data

    import jax.numpy as jnp

    from dpde_tpu.data import get_validation_view
    from dpde_tpu.data.io import load_attr
    from dpde_tpu.eval.masks import (
        combine_masks,
        random_boundary_mask,
        random_interior_mask,
    )
    from dpde_tpu.sampling import JointSampler, pde_losses
    from dpde_tpu.training import load_pretrained_params

    num_steps = int(os.environ.get("PLOT_STEPS", "50"))
    zetas = tuple(float(v) for v in
                  os.environ.get("ZETAS", "20,0.5,0.2").split(","))
    h = w = 64
    num_samples, items = 32, 4

    _ensure_test_data()
    den0 = _build_denoiser(jax, jnp)
    den = den0.replace_params(load_pretrained_params(CKPT, den0.params))
    dx = float(load_attr(TEST_DATA, "dx"))
    view = get_validation_view(str(TEST_DATA), time_as_label=True,
                               include_t0_as_target=False)
    sel = np.linspace(0, min(len(view), 1000) - 1, items).astype(int)
    a, u = view.a[sel], view.u[sel]
    labels = view.labels[sel]

    rng = np.random.default_rng(0)
    mask_a = combine_masks(
        random_interior_mask(h, w, frac_obs=0.2, rng=rng),
        random_boundary_mask(h, w, frac_obs=0.2, rng=rng))
    mask_u = np.zeros((h, w), bool)

    rep = lambda x: np.repeat(x, num_samples, axis=0)
    sampler = JointSampler(
        den, (h, w), 2, num_samples, ch_a=1,
        loss_fn=pde_losses.heat_loss2, loss_kwargs={"dx": dx},
        num_steps=num_steps, remat=False)
    x, _ = sampler.sample(
        jax.random.PRNGKey(1), jnp.asarray(rep(labels), jnp.float32),
        rep(a), rep(u), mask_a, mask_u, *zetas, num_steps=num_steps)
    xs = np.asarray(x, np.float32).reshape(items, num_samples, h, w, 2)
    recon = xs.mean(axis=1)                       # sample mean per item
    truth = np.concatenate([a, u], axis=-1)       # (items, H, W, 2)
    d_range = truth.max(axis=(1, 2)) - truth.min(axis=(1, 2))
    rel_err = np.abs(truth - recon) / d_range[:, None, None, :]

    out = Path(__file__).resolve().parents[1] / "benchmarks" / "results"
    out.mkdir(parents=True, exist_ok=True)
    np.savez(out / f"reconstruction_{num_steps}_steps.npz",
             truth=truth, recon=recon, rel_err=rel_err, items=sel,
             labels=labels, zetas=np.asarray(zetas))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(items, 6, figsize=(16, 2.6 * items))
    cols = ["truth a", "recon a", "rel err a", "truth u", "recon u",
            "rel err u"]
    for i in range(items):
        t_lbl, alpha = labels[i][0], labels[i][-1]
        panels = [truth[i, ..., 0], recon[i, ..., 0], rel_err[i, ..., 0],
                  truth[i, ..., 1], recon[i, ..., 1], rel_err[i, ..., 1]]
        for j, (ax, p) in enumerate(zip(axes[i], panels)):
            if "err" in cols[j]:
                im = ax.imshow(p, cmap="magma", vmin=0,
                               vmax=min(0.25, p.max() + 1e-9))
            else:
                vmin = min(panels[3 * (j // 3)].min(), p.min())
                vmax = max(panels[3 * (j // 3)].max(), p.max())
                im = ax.imshow(p, cmap="viridis", vmin=vmin, vmax=vmax)
            fig.colorbar(im, ax=ax, fraction=0.046)
            ax.set_xticks([]), ax.set_yticks([])
            if i == 0:
                ax.set_title(cols[j], fontsize=9)
        axes[i, 0].set_ylabel(f"t={t_lbl:.3f}\nα={alpha:.2f}", fontsize=8)
        print(f"item {sel[i]}: interior rel MAE a="
              f"{rel_err[i, 2:-2, 2:-2, 0].mean():.4f} "
              f"u={rel_err[i, 2:-2, 2:-2, 1].mean():.4f}")
    fig.suptitle(f"Guided reconstruction, {num_steps} steps, "
                 f"zetas={zetas} (sample mean of {num_samples})",
                 fontsize=10)
    fig.tight_layout()
    fig.savefig(out / f"reconstruction_{num_steps}_steps.png", dpi=140)
    print("wrote", out / f"reconstruction_{num_steps}_steps.png")


if __name__ == "__main__":
    main()
