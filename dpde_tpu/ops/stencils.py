"""Finite-difference stencil operators (NHWC, TPU-friendly).

TPU-native replacement for the reference's conv2d-based 5-point Laplacian
(reference: src/diffusion_pde/sampling/sample.py:106-134). Instead of a
3x3 convolution with an almost-empty kernel, the stencil is expressed as
shifted adds on a reflect-padded array — pure VPU work that XLA fuses into
neighbouring elementwise ops. A Pallas kernel version lives in
``dpde_tpu.ops.pallas.laplacian`` for the hot path on larger grids.

Layout note: the whole framework is channels-last (NHWC); the reference is
NCHW. All operators here treat the *last two non-channel* dims as (H, W),
i.e. arrays are (..., H, W) or (..., H, W, C).
"""

from __future__ import annotations

import jax.numpy as jnp


def reflect_pad_hw(u: jnp.ndarray, pad: int = 1, channels_last: bool = False):
    """Reflect-pad the spatial dims of ``u``.

    channels_last=False: u is (..., H, W); True: u is (..., H, W, C).
    Mirrors torch's ``pad(mode='reflect')`` (edge value not duplicated).
    """
    nd = u.ndim
    cfg = [(0, 0)] * nd
    if channels_last:
        cfg[-3] = (pad, pad)
        cfg[-2] = (pad, pad)
    else:
        cfg[-2] = (pad, pad)
        cfg[-1] = (pad, pad)
    return jnp.pad(u, cfg, mode="reflect")


def laplacian(u: jnp.ndarray, dx: float, channels_last: bool = False) -> jnp.ndarray:
    """5-point Laplacian with reflect boundary, matching the reference
    semantics (sample.py:106-134):

        lap[i,j] = (u[i+1,j] + u[i-1,j] + u[i,j+1] + u[i,j-1] - 4 u[i,j]) / dx^2

    where out-of-range neighbours are taken from the reflect padding.
    Works on arrays of any leading batch/channel shape.
    """
    h_ax, w_ax = (-3, -2) if channels_last else (-2, -1)
    up = reflect_pad_hw(u, 1, channels_last)

    def sl(axis: int, lo: int, hi_off: int):
        idx = [slice(None)] * up.ndim
        for ax, (a, b) in ((h_ax, (1, -1)), (w_ax, (1, -1))):
            idx[ax] = slice(a, b)
        idx[axis] = slice(lo, up.shape[axis] + hi_off)
        return up[tuple(idx)]

    center = sl(h_ax, 1, -1)  # == u
    north = sl(h_ax, 0, -2)
    south = sl(h_ax, 2, 0)
    west = sl(w_ax, 0, -2)
    east = sl(w_ax, 2, 0)
    return (north + south + west + east - 4.0 * center) / (dx * dx)
