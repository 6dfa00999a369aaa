"""Observation-mask generators (reference: src/diffusion_pde/
model_testing.py:12-159), numpy-based (masks are built once on the host)."""

from __future__ import annotations

import numpy as np


def random_boundary_mask(h: int, w: int, *, frac_obs: float = 0.5,
                         n: int | None = None, rng=None,
                         include_corners: bool = True) -> np.ndarray:
    """Random subset of the boundary ring (model_testing.py:12-57)."""
    rng = rng or np.random.default_rng()
    m = np.zeros((h, w), dtype=bool)
    m[[0, -1], :] = True
    m[:, [0, -1]] = True
    if not include_corners:
        m[0, 0] = m[0, -1] = m[-1, 0] = m[-1, -1] = False
    if n is None:
        if frac_obs == 1.0:
            return m
        if frac_obs == 0.0:
            return np.zeros((h, w), dtype=bool)
        n = int(frac_obs * (2 * h + 2 * w - 4))
    b = np.flatnonzero(m.ravel())
    if n > b.size:
        raise ValueError(f"n={n} > boundary points={b.size}")
    keep = rng.permutation(b)[:n]
    m = np.zeros((h, w), dtype=bool)
    m.ravel()[keep] = True
    return m


def random_interior_mask(h: int, w: int, *, frac_obs: float = 0.5,
                         n: int | None = None, rng=None) -> np.ndarray:
    """Random subset of interior pixels (model_testing.py:60-101)."""
    rng = rng or np.random.default_rng()
    m = np.zeros((h, w), dtype=bool)
    m[1:-1, 1:-1] = True
    if n is None:
        if frac_obs == 1.0:
            return m
        if frac_obs == 0.0:
            return np.zeros((h, w), dtype=bool)
        n = int(frac_obs * (h - 2) * (w - 2))
    b = np.flatnonzero(m.ravel())
    if n > b.size:
        raise ValueError(f"n={n} > interior points={b.size}")
    keep = rng.permutation(b)[:n]
    m = np.zeros((h, w), dtype=bool)
    m.ravel()[keep] = True
    return m


def combine_masks(*masks: np.ndarray) -> np.ndarray:
    """Logical OR of masks (model_testing.py:104-124)."""
    if not masks:
        raise ValueError("At least one mask must be provided.")
    out = masks[0].copy()
    for m in masks[1:]:
        out |= m
    return out


def get_masks_from_config(cfg, rng=None):
    """Build (mask_a, mask_u) from cfg.observations + sample_shape
    (model_testing.py:127-159)."""
    h, w = cfg.sampling_conf.sample_shape
    obs = cfg.observations
    rng = rng or np.random.default_rng()

    interior_a = random_interior_mask(h, w, frac_obs=obs.interior_a, rng=rng)
    boundary_a = random_boundary_mask(h, w, frac_obs=obs.boundary_a, rng=rng)
    interior_u = interior_a if obs.same_interior else random_interior_mask(
        h, w, frac_obs=obs.interior_u, rng=rng)
    boundary_u = boundary_a if obs.same_boundary else random_boundary_mask(
        h, w, frac_obs=obs.boundary_u, rng=rng)

    return (combine_masks(interior_a, boundary_a),
            combine_masks(interior_u, boundary_u))
