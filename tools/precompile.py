"""Pre-populate the persistent XLA compilation cache for the sampler
programs the bench/sweeps/evals will run.

Compilation is weight-independent and — on the tunneled axon platform —
does not need exclusive device ownership, so the big guided-sampler
programs (~18 min each at default effort, BENCH_r01/r02) can be built
*while the TPU executes a training run* and land in ``.jax_cache`` for
every later process to hit warm.

    python tools/precompile.py heat:50:4 heat:20:4 heat:200:4   # steps:items
    python tools/precompile.py llg:300:4 uncond:50:1

Spec grammar: ``<family>:<num_steps>:<items_per_batch>`` where family is
``heat`` (JointSampler, heat_loss2 + jvp — the bench program), ``llg``
(JointSampler on 64x16x6 with llg_loss2 + dummy derivative — the
conf/sampling_conf/llg.yaml program), or ``uncond`` (UnconditionalSampler
on the heat shape).

The lowered HLO must match the later trace bit-for-bit, so shapes/dtypes
here mirror bench.py / test.py exactly (num_samples=32 reference batch,
f32 observations/masks/zetas, latents=None).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dpde_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import os  # noqa: E402

import jax  # noqa: E402

# mirror bench.py's BENCH_MATMUL_PRECISION (affects lowering → cache key)
_mp = os.environ.get("BENCH_MATMUL_PRECISION")
if _mp:
    jax.config.update("jax_default_matmul_precision", _mp)
import jax.numpy as jnp  # noqa: E402

from dpde_tpu.sampling import (  # noqa: E402
    JointSampler,
    UnconditionalSampler,
    net_and_dnet_dt_dummy,
    pde_losses,
)
from dpde_tpu.sampling.karras import karras_sigmas  # noqa: E402


def _denoiser(img_channels, label_dim, h, w):
    from dpde_tpu.models import Denoiser, EDMUNet

    # must mirror bench.py: bf16 serving default (r4 A/B: quality parity
    # with fp32 at tuned zetas), BENCH_DTYPE=float32 for the training-
    # dtype configuration
    import os
    dtype = {"float32": None, "bfloat16": jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "bfloat16")]
    net = EDMUNet(img_channels=img_channels, label_dim=label_dim,
                  dtype=dtype)
    # one jitted host-CPU init — eager init pays a tunnel RTT per op
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.jit(net.init, backend="cpu")(
            jax.random.PRNGKey(0),
            jnp.zeros((1, h, w, img_channels), jnp.float32),
            jnp.ones((1,)), jnp.zeros((1, label_dim)), None)
    # placement must match the later bench/test trace exactly (committed
    # device arrays), or the lowered HLO — and thus the cache key — drifts
    params = jax.device_put(params, jax.devices()[0])

    def apply_fn(p, xx, ss, ll, oo, train=False, rngs=None):
        return net.apply(p, xx, ss, ll, oo, train=train)

    return Denoiser(apply_fn, params)


def build(family: str, num_steps: int, items: int):
    num_samples = 32
    if family in ("heat", "heat_eval"):
        # "heat" mirrors bench.py (remat=False); "heat_eval" mirrors
        # test.py's test_loop sampler (JointSampler default remat=True)
        h = w = 64
        c, ch_a, label_dim = 2, 1, 2
        den = _denoiser(c, label_dim, h, w)
        sampler = JointSampler(
            den, (h, w), c, num_samples, ch_a=ch_a,
            loss_fn=pde_losses.heat_loss2,
            loss_kwargs={"dx": 1.0 / (w - 1)}, num_steps=num_steps,
            remat=(family == "heat_eval"))
    elif family == "llg":
        h, w = 64, 16
        c, ch_a, label_dim = 6, 3, 4
        den = _denoiser(c, label_dim, h, w)
        sampler = JointSampler(
            den, (h, w), c, num_samples, ch_a=ch_a,
            loss_fn=pde_losses.llg_loss2, loss_kwargs={},
            num_steps=num_steps, out_and_grad_fn=net_and_dnet_dt_dummy)
    elif family == "uncond":
        h = w = 64
        c, label_dim = 2, 2
        den = _denoiser(c, label_dim, h, w)
        b = num_samples * items
        sampler = UnconditionalSampler(den, (h, w), c, b,
                                       num_steps=num_steps)
        sigmas = jnp.asarray(
            karras_sigmas(num_steps, sampler.sigma_min, sampler.sigma_max,
                          sampler.rho), jnp.float32)
        labels = jnp.zeros((b, label_dim), jnp.float32)
        return sampler._jit.lower(
            sampler.net, jax.random.PRNGKey(1), sigmas, labels, None,
            num_steps=num_steps, have_labels=True, have_obs=False)
    else:
        raise ValueError(family)

    b = num_samples * items
    rng = np.random.default_rng(0)
    sigmas = jnp.asarray(
        karras_sigmas(num_steps, sampler.sigma_min, sampler.sigma_max,
                      sampler.rho), jnp.float32)
    args = (
        jax.random.PRNGKey(1), sigmas,
        jnp.asarray(rng.uniform(0.1, 1.0, (b, label_dim)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, h, w, ch_a)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, h, w, c - ch_a)), jnp.float32),
        jnp.asarray(np.zeros((h, w)), jnp.float32),
        jnp.asarray(np.zeros((h, w)), jnp.float32),
        jnp.asarray(10.0, jnp.float32), jnp.asarray(0.5, jnp.float32),
        jnp.asarray(10.0, jnp.float32), None,
    )
    return sampler._jit.lower(sampler.net, *args, num_steps=num_steps,
                              have_labels=True)


def main():
    specs = sys.argv[1:] or ["heat:50:4"]
    for spec in specs:
        family, steps, items = spec.split(":")
        t0 = time.perf_counter()
        lowered = build(family, int(steps), int(items))
        t1 = time.perf_counter()
        lowered.compile()
        t2 = time.perf_counter()
        print(f"[{spec}] trace+lower {t1 - t0:.1f}s, compile {t2 - t1:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
