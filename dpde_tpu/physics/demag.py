"""Newell demagnetization tensor + FFT-convolution demag field.

TPU-native replacement for MagTense's magnetostatics (reference:
tests/test_llg_pde_loss.py:89-107 uses ``magtense.magstatics.Tiles`` /
``run_simulation`` to evaluate the demag field of uniformly magnetized
prisms). For a regular grid of identical rectangular prisms the exact
cell-averaged interaction is the Newell tensor (Newell, Williams & Dunlop,
JGR 1993), and the field is the discrete convolution

    H_d(p) = - sum_q  N(p - q) . M(q),      M = Ms * m

evaluated here as a zero-padded FFT convolution (XLA rFFT on TPU). The
tensor assembly runs once on the host in float64 (numpy); an optional C++
ctypes kernel accelerates assembly for large grids (see native/).

Conventions: thin films are a single cell layer in z (nz = 1), so only the
in-plane (2D) displacement table is built. Self-term check: an isolated
cube has N(0) = diag(1/3, 1/3, 1/3).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Newell auxiliary functions f (for diagonal) and g (for off-diagonal),
# evaluated singularity-safe in float64.
# ---------------------------------------------------------------------------

def _safe_div(a, b):
    return np.where(b == 0.0, 0.0, a / np.where(b == 0.0, 1.0, b))


def _newell_f(x, y, z):
    x, y, z = np.abs(x), np.abs(y), np.abs(z)
    r = np.sqrt(x * x + y * y + z * z)
    xz = np.sqrt(x * x + z * z)
    xy = np.sqrt(x * x + y * y)
    out = np.zeros_like(r)
    # (y/2)(z^2 - x^2) asinh(y / sqrt(x^2+z^2))
    out += np.where(xz > 0, 0.5 * y * (z * z - x * x)
                    * np.arcsinh(_safe_div(y, xz)), 0.0)
    # (z/2)(y^2 - x^2) asinh(z / sqrt(x^2+y^2))
    out += np.where(xy > 0, 0.5 * z * (y * y - x * x)
                    * np.arcsinh(_safe_div(z, xy)), 0.0)
    # -xyz atan(yz / (x r))
    out -= np.where((x > 0) & (r > 0),
                    x * y * z * np.arctan(_safe_div(y * z, x * r)), 0.0)
    # (1/6)(2x^2 - y^2 - z^2) r
    out += (2.0 * x * x - y * y - z * z) * r / 6.0
    return out


def _newell_g(x, y, z):
    z = np.abs(z)
    r = np.sqrt(x * x + y * y + z * z)
    xy = np.sqrt(x * x + y * y)
    yz = np.sqrt(y * y + z * z)
    xz = np.sqrt(x * x + z * z)
    out = np.zeros_like(r)
    out += np.where(xy > 0, x * y * z * np.arcsinh(_safe_div(z, xy)), 0.0)
    out += np.where(yz > 0, (y / 6.0) * (3.0 * z * z - y * y)
                    * np.arcsinh(_safe_div(x, yz)), 0.0)
    out += np.where(xz > 0, (x / 6.0) * (3.0 * z * z - x * x)
                    * np.arcsinh(_safe_div(y, xz)), 0.0)
    # guards protect 0/0 only — the atan arguments are odd in the guarded
    # variable, and the coefficient vanishes when it is 0, so `!= 0` keeps
    # the parity of g intact (a `> 0` guard here would zero the negative
    # branch and break the Nxz/Nyz cancellation for coplanar cells).
    out -= np.where(z != 0, (z ** 3 / 6.0)
                    * np.arctan(_safe_div(x * y, z * r)), 0.0)
    out -= np.where(y != 0, (z * y * y / 2.0)
                    * np.arctan(_safe_div(x * z, y * r)), 0.0)
    out -= np.where(x != 0, (z * x * x / 2.0)
                    * np.arctan(_safe_div(y * z, x * r)), 0.0)
    out -= x * y * z * r / 3.0
    return out


def _second_difference(fun, X, Y, Z, dx, dy, dz):
    """Triple second central difference sum_{ijk} w_i w_j w_k fun(...) with
    weights w = (1, -2, 1) over offsets (-d, 0, +d)."""
    w = (1.0, -2.0, 1.0)
    acc = np.zeros(np.broadcast(X, Y, Z).shape)
    for i, wi in zip((-1, 0, 1), w):
        for j, wj in zip((-1, 0, 1), w):
            for k, wk in zip((-1, 0, 1), w):
                acc += wi * wj * wk * fun(X + i * dx, Y + j * dy, Z + k * dz)
    return acc


def newell_tensor_2d(nx: int, ny: int, dx: float, dy: float, dz: float,
                     use_native: bool = True) -> np.ndarray:
    """Demag tensor table for in-plane displacements of a single-layer grid.

    Returns array of shape (2*nx, 2*ny, 6) with components
    (Nxx, Nyy, Nzz, Nxy, Nxz, Nyz) laid out in circulant (FFT) order:
    index i holds displacement ((i + nx) mod 2nx) - nx along x, same for y.
    Nxz and Nyz vanish for coplanar cells but are kept for generality.
    """
    if use_native:
        try:
            from ..native import newell_native
            tab = newell_native.newell_tensor_2d(nx, ny, dx, dy, dz)
            if tab is not None:
                return tab
        except Exception:
            pass

    rx = np.arange(-nx + 1, nx + 1)   # length 2nx, displacement values
    ry = np.arange(-ny + 1, ny + 1)
    X = rx[:, None] * dx
    Y = ry[None, :] * dy
    Z = np.zeros_like(X + Y)
    scale = 1.0 / (4.0 * np.pi * dx * dy * dz)

    nxx = -scale * _second_difference(_newell_f, X, Y, Z, dx, dy, dz)
    nyy = -scale * _second_difference(
        lambda a, b, c: _newell_f(b, a, c), X, Y, Z, dx, dy, dz)
    nzz = -scale * _second_difference(
        lambda a, b, c: _newell_f(c, b, a), X, Y, Z, dx, dy, dz)
    nxy = -scale * _second_difference(_newell_g, X, Y, Z, dx, dy, dz)
    nxz = -scale * _second_difference(
        lambda a, b, c: _newell_g(a, c, b), X, Y, Z, dx, dy, dz)
    nyz = -scale * _second_difference(
        lambda a, b, c: _newell_g(b, c, a), X, Y, Z, dx, dy, dz)

    tab = np.stack([nxx, nyy, nzz, nxy, nxz, nyz], axis=-1)
    # roll so displacement 0 sits at index 0 (circulant order for FFT conv)
    tab = np.roll(tab, shift=(-(nx - 1), -(ny - 1)), axis=(0, 1))
    return tab


@dataclass(frozen=True)
class DemagKernel:
    """Precomputed demag operator in one of two TPU execution modes.

    * ``method='matmul'`` (default for small grids): the block-Toeplitz
      interaction matrix is densified to (nx*ny, nx*ny) per unique tensor
      component and the field is 6 MXU matmuls. At the reference's 64x16
      thin-film size this is both faster than FFT convolution on TPU and
      avoids complex arithmetic entirely.
    * ``method='fft'``: classic zero-padded rFFT convolution, O(N log N),
      for large grids where the dense matrix would not fit.
    """

    nx: int
    ny: int
    method: str
    # matmul mode: (nx*ny, nx*ny) float32 per component, else None
    a_xx: jnp.ndarray | None = None
    a_yy: jnp.ndarray | None = None
    a_zz: jnp.ndarray | None = None
    a_xy: jnp.ndarray | None = None
    # fft mode: (2nx, ny+1) complex64 per component, else None
    f_nxx: jnp.ndarray | None = None
    f_nyy: jnp.ndarray | None = None
    f_nzz: jnp.ndarray | None = None
    f_nxy: jnp.ndarray | None = None
    f_nxz: jnp.ndarray | None = None
    f_nyz: jnp.ndarray | None = None

    @staticmethod
    def build(nx: int, ny: int, dx: float, dy: float, dz: float,
              use_native: bool = True, method: str | None = None,
              ) -> "DemagKernel":
        if method is None:
            method = "matmul" if nx * ny <= 4096 else "fft"
        tab = newell_tensor_2d(nx, ny, dx, dy, dz, use_native=use_native)
        if method == "fft":
            ffts = [
                jnp.asarray(np.fft.rfft2(tab[..., c]).astype(np.complex64))
                for c in range(6)
            ]
            return DemagKernel(nx, ny, "fft",
                               f_nxx=ffts[0], f_nyy=ffts[1], f_nzz=ffts[2],
                               f_nxy=ffts[3], f_nxz=ffts[4], f_nyz=ffts[5])
        # densify block-Toeplitz: A[(p), (q)] = N[(p-q) mod 2n]
        ix = np.arange(nx)
        iy = np.arange(ny)
        dxi = (ix[:, None] - ix[None, :]) % (2 * nx)   # (nx, nx)
        dyi = (iy[:, None] - iy[None, :]) % (2 * ny)   # (ny, ny)
        mats = []
        for c in (0, 1, 2, 3):  # xx, yy, zz, xy (xz, yz vanish in-plane)
            comp = tab[..., c]
            a = comp[dxi[:, None, :, None], dyi[None, :, None, :]]
            mats.append(jnp.asarray(
                a.reshape(nx * ny, nx * ny).astype(np.float32)))
        return DemagKernel(nx, ny, "matmul",
                           a_xx=mats[0], a_yy=mats[1], a_zz=mats[2],
                           a_xy=mats[3])


def _fields(k: DemagKernel):
    return (k.a_xx, k.a_yy, k.a_zz, k.a_xy,
            k.f_nxx, k.f_nyy, k.f_nzz, k.f_nxy, k.f_nxz, k.f_nyz)


jax.tree_util.register_pytree_node(
    DemagKernel,
    lambda k: (_fields(k), (k.nx, k.ny, k.method)),
    lambda aux, ch: DemagKernel(aux[0], aux[1], aux[2], *ch),
)


def h_demag(m: jnp.ndarray, kernel: DemagKernel, ms: float) -> jnp.ndarray:
    """Demag field of magnetization m (..., nx, ny, 3) in unit vectors;
    returns H_d in A/m with the convention H_d = -N * (Ms m)."""
    if kernel.method == "matmul":
        return _h_demag_matmul(m, kernel, ms)
    return _h_demag_fft(m, kernel, ms)


def _h_demag_matmul(m: jnp.ndarray, k: DemagKernel, ms: float) -> jnp.ndarray:
    nx, ny = k.nx, k.ny
    lead = m.shape[:-3]
    mv = (m * ms).reshape(lead + (nx * ny, 3))
    mx, my, mz = mv[..., 0], mv[..., 1], mv[..., 2]
    # H = -A M ; contraction over source cells rides the MXU
    dot = lambda a, v: jnp.einsum("pq,...q->...p", a, v,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
    hx = dot(k.a_xx, mx) + dot(k.a_xy, my)
    hy = dot(k.a_xy, mx) + dot(k.a_yy, my)
    hz = dot(k.a_zz, mz)
    out = jnp.stack([hx, hy, hz], axis=-1).reshape(lead + (nx, ny, 3))
    return -out


def _h_demag_fft(m: jnp.ndarray, kernel: DemagKernel, ms: float) -> jnp.ndarray:
    nx, ny = kernel.nx, kernel.ny
    pad = [(0, 0)] * (m.ndim - 3) + [(0, nx), (0, ny), (0, 0)]
    mp = jnp.pad(m * ms, pad)
    mx = jnp.fft.rfft2(mp[..., 0], axes=(-2, -1))
    my = jnp.fft.rfft2(mp[..., 1], axes=(-2, -1))
    mz = jnp.fft.rfft2(mp[..., 2], axes=(-2, -1))
    hx = kernel.f_nxx * mx + kernel.f_nxy * my + kernel.f_nxz * mz
    hy = kernel.f_nxy * mx + kernel.f_nyy * my + kernel.f_nyz * mz
    hz = kernel.f_nxz * mx + kernel.f_nyz * my + kernel.f_nzz * mz
    out = jnp.stack(
        [jnp.fft.irfft2(h, s=(2 * nx, 2 * ny), axes=(-2, -1))[..., :nx, :ny]
         for h in (hx, hy, hz)],
        axis=-1,
    )
    return -out
