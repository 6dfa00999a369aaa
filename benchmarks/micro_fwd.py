"""Microbenchmark: single denoiser forward throughput vs batch size.

Times one EDM-preconditioned UNet forward (unet-v2 flagship shape, bf16
activations) at a few batch sizes — a quick ceiling check for the sampler
throughput work (each guided Heun step costs ~6 forward-equivalents plus a
backward, BASELINE.md row 1).

Usage: python benchmarks/micro_fwd.py [batch ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dpde_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dpde_tpu.models import Denoiser, EDMUNet  # noqa: E402


def main(batches):
    h = w = 64
    net = EDMUNet(img_channels=2, label_dim=2, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 2), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0, jnp.ones((1,)),
                      jnp.zeros((1, 2)), None)

    def apply_fn(p, xx, ss, ll, oo, train=False, rngs=None):
        return net.apply(p, xx, ss, ll, oo, train=train)

    den = Denoiser(apply_fn, params)
    # pass the denoiser as an argument (it is a registered pytree) so the
    # params stay jit inputs instead of baked-in constants
    fwd = jax.jit(lambda d, x, s, l: d(x, s, l))

    for b in batches:
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((b, h, w, 2)),
            jnp.float32)
        s = jnp.ones((b,), jnp.float32)
        l = jnp.zeros((b, 2), jnp.float32)
        fwd(den, x, s, l).block_until_ready()
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fwd(den, x, s, l)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"b={b}: fwd {dt * 1e3:.2f} ms -> {b / dt:.0f} samples/s")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]] or [128, 256, 512]
    main(args)
