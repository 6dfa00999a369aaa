"""Dataset integrity checks.

Script equivalent of the reference's 00_testing.ipynb data checks
(cells 5-7): NaN/Inf scan, magnitude ranges, monotonic t_steps, and a
train/test label-overlap check between two files.

    python tools/check_dataset.py data/heat_lineart.hdf5 \
        [--test data/heat_lineart_test.hdf5]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dpde_tpu.data.io import load_data  # noqa: E402


def check(path: str, test_path: str | None = None) -> int:
    raw = load_data(path)
    failures = 0

    def report(name: str, ok: bool, detail: str = ""):
        nonlocal failures
        print(f"  [{'OK' if ok else 'FAIL'}] {name} {detail}")
        failures += 0 if ok else 1

    print(f"checking {path}")
    print(f"  U shape {raw.u.shape}, labels "
          f"{None if raw.labels is None else raw.labels.shape}, "
          f"t_steps {raw.t_steps.shape}")
    report("finite U", bool(np.isfinite(raw.u).all()))
    mag = float(np.abs(raw.u).max())
    report("magnitude sane", mag < 1e4, f"(max |u| = {mag:.3g})")
    report("t_steps monotonic",
           bool(np.all(np.diff(raw.t_steps) > 0)),
           f"(t in [{raw.t_steps[0]:.3g}, {raw.t_steps[-1]:.3g}])")
    report("t_steps matches U time dim",
           len(raw.t_steps) == raw.u.shape[-1])
    if raw.labels is not None:
        report("finite labels", bool(np.isfinite(raw.labels).all()))
    for attr in ("dx", "dy", "T"):
        report(f"attr {attr} present", attr in raw.attrs)

    if test_path is not None:
        test = load_data(test_path)
        if raw.labels is not None and test.labels is not None:
            a = {tuple(np.round(r, 10)) for r in raw.labels}
            b = {tuple(np.round(r, 10)) for r in test.labels}
            inter = a & b
            report("no train/test label overlap", len(inter) == 0,
                   f"({len(inter)} overlapping label rows)")
    print("all checks passed" if failures == 0
          else f"{failures} check(s) FAILED")
    return failures


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("datapath")
    p.add_argument("--test", default=None)
    args = p.parse_args()
    sys.exit(1 if check(args.datapath, args.test) else 0)


if __name__ == "__main__":
    main()
