"""Render the heat loss-curve parity figures from committed bench traces.

Produces the analogues of the reference's
figures/sampling_losses_num_steps_sensitivity.png (from
benchmarks/results/bench_trace_{20,50,200}.npz — the tuned-zeta trained
bench run) and figures/sampling_losses_zeta_sensitivity.png (from the
bench_trace_50_z*.npz zeta-probe family: the reference's too-high /
just-right / PDE-off regimes on THIS checkpoint).

CPU-only: reads the committed npz traces, writes PNGs next to them.

    python benchmarks/plot_traces.py
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

RES = Path(__file__).parent / "results"
NAMES = ["obs loss a", "obs loss u", "PDE loss", "combined"]


def _plot_family(traces: dict, title: str, out: Path, logy=True):
    fig, axes = plt.subplots(1, 4, figsize=(16, 3.2))
    for ax_i, (ax, nm) in enumerate(zip(axes, NAMES)):
        for label, tr in traces.items():
            mean = tr.mean(axis=1)           # (steps, 4) item-mean
            ax.plot(np.arange(len(mean)), mean[:, ax_i], label=label)
            ax.axhline(mean[-1, ax_i], ls="--", lw=0.5)
        ax.set_title(nm)
        if logy:
            ax.set_yscale("log")
        ax.set_xlabel("iteration")
        ax.legend(fontsize=7)
    fig.suptitle(title, fontsize=10)
    fig.tight_layout()
    fig.savefig(out, dpi=140)
    print("wrote", out)


def main():
    steps = {}
    for n in (20, 50, 200):
        f = RES / f"bench_trace_{n}.npz"
        if f.exists():
            steps[f"{n} steps"] = np.load(f)["losses"]
    if steps:
        _plot_family(
            steps,
            "Guided sampling losses vs num_steps "
            "(heat joint, tuned zetas, 4 spread items x 32 samples)",
            RES / "sampling_losses_num_steps_sensitivity.png")

    zmap = {"z20.0_0.5_20.0": "too high (ref zeta_pde=20)",
            "z20.0_0.5_1.0": "high (zeta_pde=1)",
            "z20.0_0.5_0.2": "just right (zeta_pde=0.2)",
            "z20.0_0.5_0.0": "PDE off"}
    zetas = {}
    for suffix, label in zmap.items():
        f = RES / f"bench_trace_50_{suffix}.npz"
        if f.exists():
            zetas[label] = np.load(f)["losses"]
    if zetas:
        _plot_family(
            zetas,
            "Guided sampling losses vs zeta_pde (heat joint, 50 steps) — "
            "the reference's three-regime phenomenology on this checkpoint",
            RES / "sampling_losses_zeta_sensitivity.png")


if __name__ == "__main__":
    main()
