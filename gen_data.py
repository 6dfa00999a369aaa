"""Dataset generation entry point (reference: the datagen mains at
heat.py:236, heat_no_cond.py:109, llg.py:267 — unified behind one CLI).

    python gen_data.py heat --n 5000 --steps 64 --t-final 0.5 --spacing linear
    python gen_data.py heat_no_cond --n 500 --t-final 0.005
    python gen_data.py llg --n 1000 --t-steps 500

All generation runs on the accelerator: the heat path is the exact DST
solver, the LLG path the batched RK4 std-problem-4 integrator replacing
MagTense + multiprocessing.
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import jax
import numpy as np

from dpde_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dpde_tpu.data.io import ShardStore, save_data
from dpde_tpu.physics import heat as heat_phys
from dpde_tpu.physics import llg as llg_phys
from dpde_tpu.utils import get_repo_root

logging.basicConfig(level=logging.INFO, force=True,
                    format="%(asctime)s %(name)s %(levelname)s %(message)s")
logger = logging.getLogger("gen_data")


def gen_heat(args):
    tt = heat_phys.time_grid(args.steps, args.t_final, args.spacing)
    dt = np.diff(tt)
    key = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    u, a, t_steps, labels = heat_phys.generate_heat(
        key, n=args.n, batch=args.batch, s=args.s, steps=args.steps, dt=dt,
        alpha_logrange=tuple(args.alpha_logrange), n_blobs=(1, 3))
    logger.info("generated %d heat trajectories in %.1fs", args.n,
                time.perf_counter() - t0)
    name = args.out or f"heat_{args.spacing}t.hdf5"
    path = get_repo_root() / "data" / name
    save_data(
        filepath=path, a=a, u=u, labels=labels, t_steps=t_steps,
        t_final=args.t_final, dx=1.0 / (args.s - 1), dy=1.0 / (args.s - 1),
        name=name.rsplit(".", 1)[0],
        description=("2D heat equation, linear Dirichlet BCs, pseudospectral"
                     f" interior DST with lifting. {args.spacing}-spaced"
                     " time. [dpde_tpu]"),
        S=args.s, Lx=1.0, Ly=1.0,
        alpha_logrange=list(args.alpha_logrange), steps=args.steps)
    logger.info("saved %s", path)


def gen_heat_no_cond(args):
    key = jax.random.PRNGKey(args.seed)
    u, a, t_steps = heat_phys.generate_heat_no_cond(
        key, n=args.n, t_final=args.t_final, s=args.s, batch=args.batch,
        n_blobs=(4, 8))
    name = args.out or "heat_no_cond.hdf5"
    path = get_repo_root() / "data" / name
    save_data(
        filepath=path, a=a, u=u, labels=None, t_steps=t_steps,
        t_final=args.t_final, dx=1.0 / (args.s - 1), dy=1.0 / (args.s - 1),
        S=args.s, Lx=1.0, Ly=1.0, n_blobs=[4, 8],
        notes=("Heat equation dataset without conditioning: u_t = lap(u),"
               " Dirichlet BCs with linear lift. [dpde_tpu]"))
    logger.info("saved %s", path)


def gen_llg(args):
    res = llg_phys.STD4_RES
    grid = llg_phys.STD4_GRID
    data_dir = get_repo_root() / "data"
    data_dir.mkdir(parents=True, exist_ok=True)

    s_path = data_dir / f"{res[0]}_{res[1]}_s_state.npy"
    if s_path.exists():
        s_state = np.load(s_path)
        logger.info("loaded cached s-state %s", s_path)
    else:
        logger.info("relaxing s-state (one-time)...")
        t0 = time.perf_counter()
        s_state = llg_phys.gen_s_state(res=res, grid=grid)
        np.save(s_path, s_state)
        logger.info("s-state relaxed in %.1fs -> %s",
                    time.perf_counter() - t0, s_path)

    fields = llg_phys.sample_external_fields(args.n, seed=args.seed)
    t_per_step = 4e-12

    # reference schema: sequence (n, t, 3, res_x, res_y), field (n, 3) mT
    # converted to the canonical A/U/labels layout for the datasets module:
    # U (n, 3, res_x, res_y, t), labels = field (n, 3)
    name = args.out or "llg.hdf5"
    store = ShardStore(data_dir / name)  # restartable: complete batches
    seqs = np.empty((args.n, args.t_steps, res[0], res[1], 3),
                    dtype=np.float32)
    t0 = time.perf_counter()
    for start in range(0, args.n, args.batch):
        stop = min(start + args.batch, args.n)
        if store.has(start):
            seqs[start:stop] = store.load(start)
            logger.info("  %d/%d trajectories (resumed from shard)",
                        stop, args.n)
            continue
        seqs[start:stop] = llg_phys.gen_sequences(
            s_state, fields[start:stop], res=res, grid=grid,
            t_steps=args.t_steps, t_per_step=t_per_step)
        store.save(start, seqs[start:stop])
        logger.info("  %d/%d trajectories (%.1fs)", stop, args.n,
                    time.perf_counter() - t0)
    logger.info("generated %d LLG trajectories in %.1fs", args.n,
                time.perf_counter() - t0)

    u = np.moveaxis(seqs, (1, 4), (4, 1))       # (n, 3, nx, ny, t)
    t_steps_arr = np.arange(args.t_steps, dtype=np.float32) * t_per_step
    path = data_dir / name
    save_data(
        filepath=path, a=u[..., 0], u=u, labels=fields.astype(np.float32),
        t_steps=t_steps_arr, t_final=float(t_steps_arr[-1]),
        dx=grid[0] / res[0], dy=grid[1] / res[1],
        res=list(res), grid_size=list(grid), t_per_step=t_per_step,
        h_ext_angle=[0, 360], h_ext_norm=[0, 50], seed=args.seed,
        notes="muMAG std-problem-4 trajectories from the JAX LLG solver "
              "[dpde_tpu]")
    store.finalize()
    logger.info("saved %s", path)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="pde", required=True)

    ph = sub.add_parser("heat")
    ph.add_argument("--n", type=int, default=5000)
    ph.add_argument("--batch", type=int, default=256)
    ph.add_argument("--s", type=int, default=64)
    ph.add_argument("--steps", type=int, default=64)
    ph.add_argument("--t-final", type=float, default=0.5)
    ph.add_argument("--spacing", choices=["linear", "log"], default="linear")
    ph.add_argument("--alpha-logrange", type=float, nargs=2,
                    default=(-2.5, 0.5))
    ph.add_argument("--seed", type=int, default=0)
    ph.add_argument("--out", type=str, default=None)
    ph.set_defaults(fn=gen_heat)

    pn = sub.add_parser("heat_no_cond")
    pn.add_argument("--n", type=int, default=500)
    pn.add_argument("--batch", type=int, default=256)
    pn.add_argument("--s", type=int, default=64)
    pn.add_argument("--t-final", type=float, default=0.005)
    pn.add_argument("--seed", type=int, default=42)
    pn.add_argument("--out", type=str, default=None)
    pn.set_defaults(fn=gen_heat_no_cond)

    pl = sub.add_parser("llg")
    pl.add_argument("--n", type=int, default=1000)
    pl.add_argument("--batch", type=int, default=64)
    pl.add_argument("--t-steps", type=int, default=500)
    pl.add_argument("--seed", type=int, default=0)
    pl.add_argument("--out", type=str, default=None)
    pl.set_defaults(fn=gen_llg)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
