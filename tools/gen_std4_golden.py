"""Regenerate the committed muMAG std-4 golden s-state.

    python tools/gen_std4_golden.py

Relaxes the s-state with the reference protocol (100 ns under a field
decaying to zero within 1 ns, reference llg.py:20-57) on whatever backend
jax picks, and writes tests/golden/std4_s_state.npy (the input of
tests/test_std4_golden.py). ~40k RK4 steps; a minute on CPU, seconds on
TPU.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from dpde_tpu.utils.jaxcache import select_platform

select_platform()  # honour DPDE_PLATFORM=cpu for tunneled-TPU hosts

from dpde_tpu.physics import llg  # noqa: E402


def main():
    t0 = time.perf_counter()
    s = np.asarray(llg.gen_s_state())
    out = Path(__file__).parent.parent / "tests" / "golden"
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / "std4_s_state.npy", s)
    print(f"relaxed in {time.perf_counter() - t0:.1f}s; "
          f"<m> = {s.mean(axis=(0, 1))}; saved {out/'std4_s_state.npy'}")
    print("NOTE: update the 'Golden provenance' paragraph in "
          "tests/test_std4_golden.py with the generating commit hash, and "
          "re-run the published-value gates (pytest tests/test_std4_golden"
          ".py) before committing the regenerated file.")


if __name__ == "__main__":
    main()
