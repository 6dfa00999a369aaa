"""Guided-sampling evaluation harness.

Re-design of the reference test loop (reference: src/diffusion_pde/
model_testing.py:162-239). The reference iterates test items at batch 1
and runs a 32-sample guided sampler per item (~2.72 s/item on its GPU,
BASELINE.md). Here ``items_per_batch`` test items are flattened into one
sampler batch (item k repeated num_samples times); the sampler takes its
guidance sqrt-sums per item group (pde_losses.group_sqrt_sum), so every
item's samples are exactly what a standalone run would produce, while the
chip stays saturated.

Metrics match the reference exactly: per-item MAE over samples, relative
error normalised by per-channel range, per-sample std; running ``rel MAE``
and ``sample rel std`` logged per item; final ``validation_data.npz`` with
MAE/denom_abs/denom_range/std and per-channel mean relative error.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import numpy as np

from ..utils import metrics as metrics_mod

logger = logging.getLogger(__name__)


@jax.jit
def _item_metrics(smp, obs):
    """(K, s, H, W, C) samples + (K, H, W, C) truth -> per-item mean-abs
    error over samples and per-pixel sample std (model_testing.py:216-228),
    reduced on device so only K/s of the sample bytes cross the link."""
    import jax.numpy as jnp

    item_mae = jnp.abs(obs[:, None] - smp).mean(axis=1)
    smp_std = smp.std(axis=1)
    return item_mae, smp_std


def test_loop(
    sampler,
    validation_view,
    zeta_a: float,
    zeta_u: float,
    zeta_pde: float,
    wandb_kwargs: dict | None = None,
    mask_a: np.ndarray | None = None,
    mask_u: np.ndarray | None = None,
    max_num_samples: int = 1000,
    items_per_batch: int = 1,
    seed: int = 0,
    save_path: str | Path = "validation_data.npz",
    mesh=None,
    resume: bool = True,
):
    """Run guided sampling over the validation view and accumulate errors.

    With ``mesh`` (a 1-D data mesh), the flattened item x sample batch is
    sharded over the mesh's devices — items are independent, so guided
    sampling scales linearly across chips (the v5e-8 throughput path;
    parity with the unsharded run is tested in
    tests/test_parallel.py::test_dp_guided_sampling_matches_single_device).

    Returns dict with MAE, denom_abs, denom_range, std arrays and
    ch_rel_error; also writes ``save_path`` (reference model_testing.py:
    230-237).
    """
    h, w = sampler.sample_shape
    c = sampler.num_channels
    s = sampler.num_samples
    ch_a = getattr(sampler, "ch_a", c // 2)
    # forward-method samplers (ForwardConditionedSampler via the test.py
    # adapter) predict only the solution channels: the "A" field is full
    # network conditioning, truth/metrics cover U alone
    forward = bool(getattr(sampler, "forward_method", False))
    if mask_a is None:
        mask_a = np.zeros((h, w), dtype=bool)
    if mask_u is None:
        mask_u = np.zeros((h, w), dtype=bool)

    num_items = min(len(validation_view), max_num_samples)
    mae = np.empty((num_items, c, h, w), dtype=np.float32)
    denom_abs = np.empty((num_items, c, h, w), dtype=np.float32)
    denom_range = np.empty((num_items, c), dtype=np.float32)
    std = np.empty((num_items, c, h, w), dtype=np.float32)

    run = metrics_mod.init(**(wandb_kwargs or {}))
    key = jax.random.PRNGKey(seed)
    t_start = time.perf_counter()
    done = 0

    # resume from a periodic partial flush (the r4 freeze incident: a
    # wedged readback killed 141 computed batches; with tools/watchdog.py
    # the restarted run skips straight past everything already flushed)
    done_saved = 0
    partial_path = Path(str(save_path) + ".partial.npz")
    if resume and partial_path.exists():
        try:
            part = np.load(partial_path)
            if part["MAE"].shape[1:] == (c, h, w):
                done_saved = min(part["MAE"].shape[0], num_items)
                mae[:done_saved] = part["MAE"][:done_saved]
                denom_abs[:done_saved] = part["denom_abs"][:done_saved]
                denom_range[:done_saved] = part["denom_range"][:done_saved]
                std[:done_saved] = part["std"][:done_saved]
                logger.info("resuming from %s: %d items already done",
                            partial_path, done_saved)
        except Exception:
            logger.warning("ignoring unreadable partial %s", partial_path)
            done_saved = 0

    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        sh = batch_sharding(mesh)
        shard = lambda x: (jax.device_put(x, sh) if x is not None
                           and x.shape[0] % mesh.devices.size == 0 else x)
    else:
        shard = lambda x: x

    try:
        for batch in validation_view.batches(items_per_batch,
                                             limit=num_items):
            a = batch["A"]                     # (K, H, W, C/2)... NHWC
            u = batch["U"]
            labels = batch["labels"]           # (K, L) or None
            k = a.shape[0]

            if done + k <= done_saved:
                # batch fully covered by the resumed partial: advance the
                # key stream identically and skip the sampling
                key, _ = jax.random.split(key)
                done += k
                continue

            # flatten items x samples into one sampler batch (sharded over
            # the mesh when one is given)
            rep = lambda x: (shard(np.repeat(x, s, axis=0))
                             if x is not None else None)
            if forward:
                obs_a = rep(a)                 # full conditioning field
                obs_u = rep(u[..., :c])
            else:
                obs_a = rep(a[..., :ch_a] if a.shape[-1] >= ch_a else a)
                obs_u = rep(u[..., :c - ch_a])
            lab = rep(labels)

            key, k_s = jax.random.split(key)
            samples, _ = sampler.sample(
                k_s, lab, obs_a, obs_u, mask_a, mask_u,
                zeta_a, zeta_u, zeta_pde)
            obs = (u[..., :c] if forward
                   else np.concatenate([a, u], axis=-1))     # (K, H, W, C)

            # metrics reduce ON DEVICE: fetching the raw sample batch
            # (K*s*H*W*C floats) over a tunneled device link costs more
            # than the sampling itself; the per-item MAE/std maps are s
            # times smaller (and exact in float32 before the fetch)
            item_mae, smp_std = jax.device_get(_item_metrics(
                samples.reshape(k, s, h, w, c), jax.device_put(obs)))
            d_abs = np.abs(obs)
            d_range = obs.max(axis=(1, 2)) - obs.min(axis=(1, 2))  # (K, C)

            to_chw = lambda x: np.moveaxis(x, -1, 1)
            mae[done:done + k] = to_chw(item_mae)
            denom_abs[done:done + k] = to_chw(d_abs)
            denom_range[done:done + k] = d_range
            std[done:done + k] = to_chw(smp_std)

            rel = item_mae / d_range[:, None, None, :]
            rel_std = smp_std / d_range[:, None, None, :]
            run.log({"rel MAE": float(rel.mean()),
                     "sample rel std": float(rel_std.mean())})
            done += k

            # periodic partial flush: a tunneled-TPU freeze mid-eval must
            # not lose the batches already computed (r4 incident: 141/250
            # batches evaporated with a wedged readback) — the partial
            # npz + a per-channel running error line make every ~25
            # batches durable
            if (done // k) % 25 == 0 or done >= num_items:
                np.savez(str(save_path) + ".partial.npz",
                         MAE=mae[:done], denom_abs=denom_abs[:done],
                         denom_range=denom_range[:done], std=std[:done])
                part = (mae[:done]
                        / denom_range[:done, :, None, None]).mean(
                            axis=(0, 2, 3))
                logger.info("progress %d/%d items; running ch rel err: %s",
                            done, num_items,
                            np.array2string(part, precision=4))

        if not np.isfinite(mae[:done]).all():
            logger.error("MAE is not finite!")

        elapsed = time.perf_counter() - t_start
        items_per_s = done / elapsed if elapsed > 0 else float("nan")
        logger.info("evaluated %d items in %.1fs (%.2f items/s)",
                    done, elapsed, items_per_s)

        np.savez(save_path, MAE=mae[:done], denom_abs=denom_abs[:done],
                 denom_range=denom_range[:done], std=std[:done])
        Path(str(save_path) + ".partial.npz").unlink(missing_ok=True)
        rel_error = mae[:done] / denom_range[:done, :, None, None]
        ch_rel_error = rel_error.mean(axis=(0, 2, 3))
        for i in range(c):
            logger.info("  Channel %d: Mean Relative Error: %.4f",
                        i, ch_rel_error[i])
        return {
            "MAE": mae[:done],
            "denom_abs": denom_abs[:done],
            "denom_range": denom_range[:done],
            "std": std[:done],
            "ch_rel_error": ch_rel_error,
            "items_per_s": items_per_s,
        }
    finally:
        if hasattr(run, "finish"):
            run.finish()
