"""ctypes bindings for the C++ Newell-tensor assembly kernel.

Host-side native acceleration for :func:`dpde_tpu.physics.demag.newell_tensor_2d`
(the TPU analogue of the reference's native MagTense magnetostatics,
tests/test_llg_pde_loss.py:89-107). The shared library is built from
``native/newell.cc`` by ``native/build.sh`` (plain g++, no extra deps).
Falls back to the numpy implementation when the library is absent.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = Path(__file__).resolve().parents[2]
    for cand in (Path(__file__).parent / "libnewell.so",
                 root / "native" / "libnewell.so"):
        if cand.exists():
            try:
                lib = ctypes.CDLL(str(cand))
                lib.newell_tensor_2d.argtypes = [
                    ctypes.c_int, ctypes.c_int,
                    ctypes.c_double, ctypes.c_double, ctypes.c_double,
                    np.ctypeslib.ndpointer(dtype=np.float64, flags="C"),
                ]
                lib.newell_tensor_2d.restype = None
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def newell_tensor_2d(nx: int, ny: int, dx: float, dy: float, dz: float):
    """Returns the (2nx, 2ny, 6) circulant-order table, or None if the
    native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((2 * nx, 2 * ny, 6), dtype=np.float64)
    lib.newell_tensor_2d(nx, ny, dx, dy, dz, out)
    return out
