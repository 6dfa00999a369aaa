"""Path helpers (reference: src/diffusion_pde/utils.py:10-15)."""

from __future__ import annotations

import subprocess
from pathlib import Path


def get_repo_root() -> Path:
    """Repository root via git, falling back to the package parent."""
    try:
        out = subprocess.check_output(
            ["git", "rev-parse", "--show-toplevel"], text=True,
            stderr=subprocess.DEVNULL,
        ).strip()
        return Path(out)
    except Exception:
        return Path(__file__).resolve().parents[2]


def resolve_data_path(path: str | Path) -> Path:
    """Make a datapath absolute relative to the repo root (reference:
    datasets/dataset.py:269-272)."""
    p = Path(path)
    if not p.is_absolute():
        p = get_repo_root() / p
    return p
