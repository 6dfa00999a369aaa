"""Headline benchmark: guided-sampling throughput.

Measures the BASELINE metric (BASELINE.md row 1): test items per second at
the heat_logt_joint evaluation configuration — each item is one 50-step
JointSampler run over a batch of 32 samples on the 64x64 unet-v2 joint
heat model with jvp time derivatives and full guidance (obs_a + obs_u +
heat PDE residual). Reference: 2.72 s/item (0.368 items/s) on the DTU GPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "items/s", "vs_baseline": N}

`vs_baseline` is the speedup over the reference GPU baseline. Extra detail
(per-config timings) goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_ITEMS_PER_S = 1.0 / 2.72   # reference GPU (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from dpde_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from dpde_tpu.models import Denoiser, EDMUNet
    from dpde_tpu.sampling import JointSampler, pde_losses

    h = w = 64
    num_samples = 32      # reference sampling_conf batch_size
    num_steps = 50
    items_per_batch = 4   # items flattened into one device batch

    # bfloat16 activations (the forward is HBM-bandwidth-bound; params and
    # the EDM preconditioner stay float32). At bf16 both Heun evals'
    # activations fit HBM, so sampling runs without rematerialisation.
    net = EDMUNet(img_channels=2, label_dim=2, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, h, w, 2), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0, jnp.ones((1,)),
                      jnp.zeros((1, 2)), None)

    def apply_fn(p, xx, ss, ll, oo, train=False, rngs=None):
        return net.apply(p, xx, ss, ll, oo, train=train)

    den = Denoiser(apply_fn, params)

    b = num_samples * items_per_batch
    sampler = JointSampler(
        den, (h, w), 2, b, ch_a=1,
        loss_fn=pde_losses.heat_loss2, loss_kwargs={"dx": 1.0 / (w - 1)},
        num_steps=num_steps, remat=False,
    )

    rng = np.random.default_rng(0)
    obs_a = rng.standard_normal((b, h, w, 1)).astype(np.float32) * 0.3
    obs_u = rng.standard_normal((b, h, w, 1)).astype(np.float32) * 0.3
    mask_a = np.zeros((h, w), bool)
    mask_a[1:-1, 1:-1] = rng.random((h - 2, w - 2)) < 0.2   # interior 0.2
    mask_a[[0, -1], :] = mask_a[:, [0, -1]] = True
    mask_u = mask_a
    labels = jnp.asarray(
        np.concatenate([rng.uniform(0.1, 0.5, (b, 1)),
                        rng.uniform(0.1, 1.5, (b, 1))], axis=1),
        jnp.float32)

    def run(key):
        x, _ = sampler.sample(key, labels, obs_a, obs_u, mask_a, mask_u,
                              20.0, 0.5, 20.0)
        return x

    # compile + warmup
    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(1))
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        out = run(jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    elapsed = time.perf_counter() - t0

    items = reps * items_per_batch
    items_per_s = items / elapsed
    print(f"{items} items in {elapsed:.2f}s on {jax.devices()[0]}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "guided_sampling_throughput_heat_joint_50step_b32",
        "value": round(items_per_s, 4),
        "unit": "items/s",
        "vs_baseline": round(items_per_s / BASELINE_ITEMS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
