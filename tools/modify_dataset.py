"""Derive reduced datasets from an existing HDF5 dataset.

Script equivalent of the reference's ``notebooks/modify_datasets.ipynb``
— the workflow that created its ``llg_test2.hdf5`` (every 4th time step)
and ``heat_no_time.hdf5`` (first/last snapshots only). Preserves the
on-disk schema (A/U/labels/t_steps + attrs, data/io.py) so every
downstream loader works on the derived file unchanged.

    # keep every 4th time step (the reference's llg_test2 recipe)
    python tools/modify_dataset.py data/llg_test.hdf5 data/llg_test2.hdf5 \
        --stride 4
    # first/last snapshot only (the no_time recipe)
    python tools/modify_dataset.py data/heat_logt.hdf5 \
        data/heat_no_time.hdf5 --first-last
    # subset of trajectories
    python tools/modify_dataset.py data/llg.hdf5 data/llg_small.hdf5 --n 8
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import h5py
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def modify(src: str | Path, dst: str | Path, stride: int = 1,
           first_last: bool = False, n: int | None = None,
           description: str | None = None) -> dict:
    with h5py.File(src, "r") as f:
        a = f["A"][:] if "A" in f else None
        u = f["U"][:]
        labels = f["labels"][:] if "labels" in f else None
        t_steps = f["t_steps"][:] if "t_steps" in f else None
        attrs = dict(f.attrs)

    if n is not None:
        u = u[:n]
        a = a[:n] if a is not None else None
        labels = labels[:n] if labels is not None else None
    if first_last:
        u = u[..., [0, -1]]
        t_steps = t_steps[[0, -1]] if t_steps is not None else None
        attrs.pop("t_per_step", None)
    elif stride > 1:
        u = u[..., ::stride]
        t_steps = t_steps[::stride] if t_steps is not None else None
        if "t_per_step" in attrs:
            attrs["t_per_step"] = attrs["t_per_step"] * stride
    if description:
        attrs["description"] = description
    attrs["N"] = u.shape[0]

    with h5py.File(dst, "w") as f:
        if a is not None:
            f.create_dataset("A", data=a)
        f.create_dataset("U", data=u)
        if labels is not None:
            f.create_dataset("labels", data=labels)
        if t_steps is not None:
            f.create_dataset("t_steps", data=t_steps)
        for k, v in attrs.items():
            f.attrs[k] = v
    return {"N": int(u.shape[0]), "T": int(u.shape[-1]),
            "shape": tuple(u.shape)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--stride", type=int, default=1,
                    help="keep every Nth time step")
    ap.add_argument("--first-last", action="store_true",
                    help="keep only the first and last snapshots")
    ap.add_argument("--n", type=int, default=None,
                    help="keep only the first N trajectories")
    ap.add_argument("--description", default=None)
    args = ap.parse_args(argv)
    info = modify(args.src, args.dst, stride=args.stride,
                  first_last=args.first_last, n=args.n,
                  description=args.description)
    print(f"wrote {args.dst}: {info}")


if __name__ == "__main__":
    main()
