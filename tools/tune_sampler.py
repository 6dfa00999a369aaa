"""Sampler hyperparameter (zeta) tuning harness.

Replacement for the reference's skopt gp_minimize notebook
(reference: notebooks/sampler_hyperparameter_opt.ipynb cells 16-17, 30
calls over zeta_a, zeta_u in [100, 20000] (log), zeta_pde in [1, 100]).
scikit-optimize is not available here; this uses log-uniform random search
plus a local refinement pass around the incumbent — batched on-device, so
a full search costs minutes, not hours.

    python tools/tune_sampler.py sampling_conf=heat_logt_joint \
        dataset=heat_eq_logt_joint +tune.n_calls=30 +tune.n_items=8
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from dpde_tpu.data import get_validation_view  # noqa: E402
from dpde_tpu.data.io import load_attr  # noqa: E402
from dpde_tpu.eval import get_masks_from_config  # noqa: E402
from dpde_tpu.models import init_denoiser  # noqa: E402
from dpde_tpu.sampling import (  # noqa: E402
    ForwardConditionedSampler,
    JointSampler,
    net_and_dnet_dt,
    net_and_dnet_dt_dummy,
    pde_losses,
)
from dpde_tpu.training import load_pretrained_params  # noqa: E402
from dpde_tpu.utils import resolve_data_path  # noqa: E402
from dpde_tpu.utils.config import main as config_main  # noqa: E402

logging.basicConfig(level=logging.INFO, force=True)
logger = logging.getLogger("tune_sampler")


def make_objective(sampler, view, masks, n_items, seed, kind="mse"):
    """MSE of guided samples vs ground truth (the notebook's objective),
    with two throughput/robustness changes over the reference harness:
    the n_items evaluation items are flattened into ONE device batch
    (item-exact batching, samplers.py module docstring) so every tuner
    call is a single execution of one compiled program, and the items are
    spread across the eval domain instead of being the earliest-time rows
    of trajectory 0. Latents are fixed across calls so the objective is
    deterministic in the zetas."""
    mask_a, mask_u = masks
    s = sampler.num_samples
    c = sampler.num_channels
    forward = bool(getattr(sampler, "forward_method", False))
    ch_a = c // 2
    sel = np.linspace(0, min(len(view), 1000) - 1, n_items).astype(int)
    a, u = view.a[sel], view.u[sel]
    labels = view.labels[sel] if view.labels is not None else None
    rep = lambda x: np.repeat(x, s, axis=0) if x is not None else None
    if forward:
        obs_a, obs_u = rep(a), rep(u[..., :c])
        obs = u[..., :c]
    else:
        obs_a, obs_u = rep(a[..., :ch_a]), rep(u[..., :c - ch_a])
        obs = np.concatenate([a, u], axis=-1)
    lab = rep(labels)
    h, w = sampler.sample_shape
    latents = np.asarray(jax.random.normal(
        jax.random.PRNGKey(seed), (n_items * s, h, w, c)))

    # per-item per-channel range, the eval normalisation (test_loop)
    d_range = obs.max(axis=(1, 2)) - obs.min(axis=(1, 2))   # (n_items, C)

    def objective(zetas):
        samples, _ = sampler.sample(
            jax.random.PRNGKey(seed), lab, obs_a, obs_u,
            mask_a, mask_u, *zetas, latents=latents)
        smp = np.asarray(samples).reshape(n_items, s, h, w, c)
        if kind in ("rel", "maxratio"):
            # channel-balanced relative error — EXACTLY the quantity the
            # eval harness reports (per-item MAE over samples / range,
            # meaned per channel then over channels). The raw-MSE
            # objective is dominated by the wide-range u channel and
            # trades a-channel accuracy away (runs_r5 x0 tune #1).
            mae = np.abs(obs[:, None] - smp).mean(axis=1)   # (n,h,w,c)
            rel = mae.mean(axis=(1, 2)) / d_range           # (n, c)
            if kind == "maxratio":
                # minimise the WORST per-channel ratio to the r4 anchor
                # (0.0050/0.2589): a value < 1 means every channel beats
                # the anchor — "within noise" by construction, instead of
                # trading one channel for the other
                anchor = np.asarray([0.0050, 0.2589])[: rel.shape[1]]
                return float((rel.mean(axis=0) / anchor).max())
            return float(rel.mean())
        return float(((obs[:, None] - smp) ** 2).mean())

    return objective


@config_main(config_path="conf", config_name="test")
def main(cfg):
    sc = cfg.sampling_conf
    tune = cfg.get("tune", {}) or {}
    n_calls = int(tune.get("n_calls", 30))
    n_items = int(tune.get("n_items", 4))
    seed = int(tune.get("seed", 0))

    dataset_name = cfg.dataset.data.name.lower()
    time_as_label = not ("no_cond" in dataset_name
                         or "no_time" in dataset_name)
    view = get_validation_view(sc.test_data_path,
                               time_as_label=time_as_label,
                               include_t0_as_target=False)
    masks = get_masks_from_config(cfg, rng=np.random.default_rng(seed))

    # serving-path knobs, same surface as test.py (round 5):
    #   +run.eval_dtype=bfloat16 +run.param_dtype=bfloat16
    #   +run.guidance_mode=second_eval|x0  +run.llg_full_physics=true
    eval_dtype = cfg.run.get("eval_dtype") or sc.get("eval_dtype")
    if eval_dtype:
        cfg.model["dtype"] = eval_dtype
    gmode = (cfg.run.get("guidance_mode")
             or sc.get("guidance_mode", "exact") or "exact")

    key = jax.random.PRNGKey(seed)
    _, den = init_denoiser(cfg, key, tuple(sc.sample_shape),
                           cfg.dataset.net.in_ch)
    den = den.replace_params(load_pretrained_params(
        resolve_data_path(sc.pretrained_path), den.params))
    if cfg.run.get("param_dtype") == "bfloat16":
        import jax.numpy as jnp

        den = den.replace_params(jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, den.params))

    if "heat" in dataset_name:
        dx = float(load_attr(resolve_data_path(sc.test_data_path), "dx"))
        loss_fn, kw, oag = pde_losses.heat_loss2, {"dx": dx}, net_and_dnet_dt
    elif cfg.run.get("llg_full_physics", False):
        from dpde_tpu.physics import llg as llg_phys
        from dpde_tpu.physics.demag import DemagKernel

        res, grid = llg_phys.STD4_RES, llg_phys.STD4_GRID
        kernel = DemagKernel.build(res[0], res[1], grid[0] / res[0],
                                   grid[1] / res[1], grid[2])
        loss_fn = pde_losses.llg_residual_loss
        kw = {"kernel": kernel, "params": llg_phys.LLGParams()}
        oag = net_and_dnet_dt
    else:
        loss_fn, kw, oag = pde_losses.llg_loss2, {}, net_and_dnet_dt_dummy

    if cfg.dataset.method.lower() == "forward":
        import test as test_entry

        inner = ForwardConditionedSampler(
            den, tuple(sc.sample_shape), sc.num_channels, sc.batch_size,
            loss_fn=loss_fn, loss_kwargs=kw, num_steps=sc.num_steps,
            sigma_min=sc.sigma_min, sigma_max=sc.sigma_max, rho=sc.rho,
            out_and_grad_fn=oag, remat=False)
        sampler = test_entry._ForwardTestAdapter(inner)
    else:
        sampler = JointSampler(
            den, tuple(sc.sample_shape), sc.num_channels, sc.batch_size,
            ch_a=sc.num_channels // 2, loss_fn=loss_fn, loss_kwargs=kw,
            num_steps=sc.num_steps, sigma_min=sc.sigma_min,
            sigma_max=sc.sigma_max, rho=sc.rho, out_and_grad_fn=oag,
            remat=False, guidance_mode=gmode,
            hybrid_split=float(cfg.run.get("hybrid_split")
                               or sc.get("hybrid_split", 0.8)))

    rng = np.random.default_rng(seed)
    # Log-uniform search box: zeta_a, zeta_u, zeta_pde. Deliberately wider
    # at the bottom than the reference notebook's uniform boxes
    # (zeta_a, zeta_u in [100, 20000], zeta_pde in [1, 100] —
    # notebooks/sampler_hyperparameter_opt.ipynb): the shipped optima sit
    # at/below that floor (conf/sampling_conf/heat_logt_joint.yaml has
    # zeta_a=20, zeta_u=0.5), so the floor would exclude them; log-uniform
    # also matches the scale-free role of the weights better than skopt's
    # uniform prior.
    # zeta_pde floor lowered to 0.01 (r4): the r3 explosion diagnosis
    # showed this checkpoint's stable PDE-guidance regime sits well below
    # 1 at 50 steps, and a floor of 1 would exclude the optimum entirely.
    lo = np.log(np.asarray([1.0, 0.01, 0.01]))
    hi = np.log(np.asarray([20000.0, 20000.0, 100.0]))

    objective = make_objective(sampler, view, masks, n_items, seed,
                               kind=str(tune.get("objective", "mse")))
    history = []
    best = (None, np.inf)
    # Seed candidates: the reference's shipped optimum and the r4 probe's
    # low-zeta_pde stable points — evaluated first so the refinement half
    # of the budget starts from a sane incumbent.
    seeds_z = [(sc.zeta_a, sc.zeta_u, sc.zeta_pde),
               (sc.zeta_a, sc.zeta_u, 0.2),
               (sc.zeta_a, sc.zeta_u, 0.02)]
    for it in range(n_calls):
        if it < len(seeds_z):
            z = np.asarray(seeds_z[it], dtype=float)
        elif best[0] is not None and it > n_calls // 2:
            # refine around incumbent (+- half a decade)
            center = np.log(np.asarray(best[0]))
            z = np.exp(center + rng.uniform(-0.5, 0.5, 3))
        else:
            z = np.exp(rng.uniform(lo, hi))
        mse = objective(tuple(z))
        history.append({"zeta_a": z[0], "zeta_u": z[1], "zeta_pde": z[2],
                        "mse": mse})
        if mse < best[1]:
            best = (tuple(z), mse)
        logger.info("call %d/%d zetas=(%.2f, %.3f, %.2f) mse=%.5f best=%.5f",
                    it + 1, n_calls, *z, mse, best[1])

    out = {"best": {"zeta_a": best[0][0], "zeta_u": best[0][1],
                    "zeta_pde": best[0][2], "mse": best[1]},
           "history": history}
    out_path = Path(cfg.run.dir) / "sampler_tuning.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(out, indent=2))
    logger.info("best zetas: %s -> %s", best[0], out_path)


if __name__ == "__main__":
    main()
